package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests (SURVEY §5.2 item 4, honoring the reference's Hypothesis
  * intent): relational algebra laws checked against Scala collection
  * semantics on generated data. */
class AlgebraSpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = Gen.listOfN(30, Gen.chooseNum(0, 9))
  private val pairRows = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 100)))

  private def df(xs: List[Int]): DataFrame = xs.toDF("x")
  private def bag(d: DataFrame): Map[Int, Long] =
    d.as[Int].collect().groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("H2/H3/H4: union-distinct / intersect / except match set semantics") {
    forSamples(Gen.zip(rows, rows), 8) { case (a, b) =>
      bag(df(a).union(df(b)).distinct()).keySet shouldBe (a.toSet ++ b.toSet)
      bag(df(a).intersect(df(b))).keySet shouldBe (a.toSet & b.toSet)
      bag(df(a).except(df(b))).keySet shouldBe (a.toSet -- b.toSet)
    }
  }

  test("H5: intersectAll/exceptAll match multiset semantics") {
    forSamples(Gen.zip(rows, rows), 8) { case (a, b) =>
      val ca = a.groupBy(identity).view.mapValues(_.length).toMap
      val cb = b.groupBy(identity).view.mapValues(_.length).toMap
      val interExpected = ca.flatMap { case (k, n) =>
        val m = math.min(n, cb.getOrElse(k, 0)); if (m > 0) Some(k -> m.toLong) else None
      }
      val exceptExpected = ca.flatMap { case (k, n) =>
        val m = n - cb.getOrElse(k, 0); if (m > 0) Some(k -> m.toLong) else None
      }
      bag(df(a).intersectAll(df(b))) shouldBe interExpected
      bag(df(a).exceptAll(df(b))) shouldBe exceptExpected
    }
  }

  test("K1: deterministic dedup keeps the min per key and is idempotent") {
    import org.apache.spark.sql.expressions.Window
    forSamples(pairRows, 6) { pairs =>
      val d = pairs.toDF("k", "v")
      val w = Window.partitionBy($"k").orderBy($"v", $"k")
      val dedup = d.withColumn("rn", row_number().over(w)).where($"rn" === 1).drop("rn")
      val expected = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      dedup.as[(Int, Int)].collect().toMap shouldBe expected
      val again = dedup.withColumn("rn", row_number().over(w)).where($"rn" === 1).drop("rn")
      again.as[(Int, Int)].collect().toSet shouldBe dedup.as[(Int, Int)].collect().toSet
    }
  }

  test("B6: lossless int↔string casts round-trip") {
    forSamples(Gen.listOfN(20, Gen.chooseNum(Int.MinValue, Int.MaxValue)), 6) { xs =>
      val rt = xs.toDF("x").select($"x".cast("string").cast("int").as("x"))
      rt.as[Int].collect().toList shouldBe xs
    }
  }

  test("B6: try_cast yields null on failure, never throws") {
    val out = Seq("12", "x", "", "7.5").toDF("s")
      .selectExpr("try_cast(s AS INT) AS i").as[Option[Int]].collect()
    out shouldBe Array(Some(12), None, None, None)
  }

  test("F3/E1: windowed running sum ends at the groupBy total") {
    import org.apache.spark.sql.expressions.Window
    forSamples(Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 1000L))), 6) { pairs =>
      val d = pairs.zipWithIndex.map { case ((k, v), i) => (k, v, i) }.toDF("k", "v", "i")
      val w = Window.partitionBy($"k").orderBy($"i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastRunning = d.withColumn("rs", sum($"v").over(w))
        .groupBy($"k").agg(max(struct($"i", $"rs")).as("m"))
        .select($"k", $"m.rs".as("rs")).as[(Int, Long)].collect().toMap
      val totals = d.groupBy($"k").agg(sum($"v")).as[(Int, Long)].collect().toMap
      lastRunning shouldBe totals
    }
  }
}
