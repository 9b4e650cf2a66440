package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.{Bpe, BpeTokens}
import graft.pipeline.PipelineRunner

/** BPE train + apply laws (graft.ext.Bpe) and the config surface over
  * them. Cross-engine apply equivalence is oracle-checked end to end by
  * j18; these are the algorithmic contracts the oracle can't isolate. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("trainMerges: deterministic rank order with count-then-lexicographic ties") {
    // "aaab"×3: (a,a) counts 6 beats (a,b) 3 → rank 1. After merging,
    // (aa,a)=3 ties (a,b)=3 → lexicographic picks (a,b). Then (aa,ab)=3.
    val merges = Bpe.trainMerges(Seq(("aaab", 3L)), 10)
    merges shouldBe Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    // stable under re-run and under input order permutation
    Bpe.trainMerges(Seq(("aaab", 3L)), 10) shouldBe merges
    // singleton pairs (count < 2) never merge: a frequency-1 word alone
    // contributes pairs of weight 1 → training stops immediately
    Bpe.trainMerges(Seq(("xyz", 1L)), 10) shouldBe Seq()
    // merge budget is honored
    Bpe.trainMerges(Seq(("aaab", 3L)), 1) shouldBe Seq(("a", "a"))
  }

  test("tokenizeWord: greedy lowest-rank-leftmost apply") {
    val ranks = new java.util.HashMap[String, Int]()
    Seq(("a", "a"), ("a", "b"), ("aa", "ab")).zipWithIndex.foreach {
      case ((a, b), i) => ranks.put(a + " " + b, i + 1)
    }
    Bpe.tokenizeWord("aaab", ranks).toSeq shouldBe Seq("aaab")
    Bpe.tokenizeWord("aab", ranks).toSeq shouldBe Seq("aa", "b")
    Bpe.tokenizeWord("ba", ranks).toSeq shouldBe Seq("b", "a")
    Bpe.tokenizeWord("a", ranks).toSeq shouldBe Seq("a")
    // "aaa": leftmost (a,a) merges first → [aa, a] (not [a, aa])
    Bpe.tokenizeWord("aaa", ranks).toSeq shouldBe Seq("aa", "a")
  }

  test("BpeTokens expression: normalization, word split, null; codegen = interpreted") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    // interpreted path
    val e = BpeTokens(Literal(UTF8String.fromString("Low-lower LOW!"),
      org.apache.spark.sql.types.StringType), merges)
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq shouldBe
      Seq("low", "low", "e", "r", "low")
    // codegen path through a real plan, vs the same eval
    val df = Seq("Low-lower LOW!", "", "123 abc", null.asInstanceOf[String])
      .toDF("text")
      .withColumn("p", org.apache.spark.sql.GraftSqlBridge.column(
        BpeTokens(org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
          merges)))
    val rows = df.select("p").collect()
    rows(0).getSeq[String](0) shouldBe Seq("low", "low", "e", "r", "low")
    rows(1).getSeq[String](0) shouldBe Seq()
    rows(2).getSeq[String](0) shouldBe Seq("1", "2", "3", "a", "b", "c")
    rows(3).isNullAt(0) shouldBe true
  }

  test("config surface: bpe_train → bpe_tokenize round-trip + guard rails") {
    val dir = "/tmp/graft_io/bpe_spec"
    Seq((1L, "aaab aaab aaab"), (2L, "aab ba"), (3L, ""))
      .toDF("id", "text").write.mode("overwrite").parquet(s"$dir/docs")
    PipelineRunner.run(spark,
      s"""name: bpe_train_spec
         |source: {format: parquet, path: "$dir/docs"}
         |transforms:
         |  - {op: bpe_train, cols: [text], k: 10}
         |sink: {format: parquet, path: "$dir/merges", mode: overwrite}
         |""".stripMargin)
    // the trained table IS the driver-side result, rank-ordered
    spark.read.parquet(s"$dir/merges").orderBy("rank")
      .as[(String, String, Int)].collect().toSeq shouldBe
      Seq(("a", "a", 1), ("a", "b", 2), ("aa", "ab", 3))
    val out = PipelineRunner.run(spark,
      s"""name: bpe_apply_spec
         |source: {format: parquet, path: "$dir/docs"}
         |transforms:
         |  - {op: bpe_tokenize, cols: [text], name: pieces,
         |     table: {format: parquet, path: "$dir/merges"}}
         |  - {op: sort, cols: [id]}
         |""".stripMargin).passed
    out.select("pieces").as[Seq[String]].collect().toSeq shouldBe Seq(
      Seq("aaab", "aaab", "aaab"), Seq("aa", "b", "b", "a"), Seq())
    (the[IllegalArgumentException] thrownBy PipelineRunner.run(spark,
      s"""name: bpe_bad1
         |source: {format: parquet, path: "$dir/docs"}
         |transforms:
         |  - {op: bpe_tokenize, cols: [text]}
         |""".stripMargin)).getMessage should include("table")
    (the[IllegalArgumentException] thrownBy PipelineRunner.run(spark,
      s"""name: bpe_bad2
         |source: {format: parquet, path: "$dir/docs"}
         |transforms:
         |  - {op: bpe_train, cols: [text], k: 0}
         |""".stripMargin)).getMessage should include("k (merge count)")
  }
}
