package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding with a LEARNED merge table (SURVEY §2.J token
  * counting upgraded from the `graft_bpeish_count` regex stand-in to the
  * real algorithm, per Sennrich et al. 2016 "Neural Machine Translation
  * of Rare Words with Subword Units", arXiv:1508.07909).
  *
  * Normalization contract (shared by train, apply, and the DuckDB
  * oracle replay): words are the maximal `[a-z0-9]+` runs of the
  * lowercased text — ASCII-only by construction, so JVM chars, SQL
  * characters, and code points all agree and the tokenization is
  * engine-portable.
  *
  * Apply semantics: repeatedly merge the LOWEST-RANK mergeable adjacent
  * pair, leftmost on rank ties, until none remains. Merging one
  * occurrence at a time in that order is equivalent to the usual
  * "merge all occurrences of the best pair per round" formulation
  * (after a leftmost merge, every other occurrence of the same pair is
  * still the best and still leftmost-first), and it is exactly
  * replayable by a recursive CTE — which is how the j18 oracle checks
  * this end to end.
  *
  * Scale posture: training runs on the aggregate-bounded word-frequency
  * table (top-K words from one distributed count — the standard
  * frequency-cutoff trainer), then the merge table is a small constant
  * shipped inside the expression; apply is map-only per row inside
  * whole-stage codegen. No shuffle, no join, no per-row regex.
  */
object Bpe {

  /** Classic BPE training over a bounded (word → frequency) table.
    * Deterministic: the best pair maximizes summed frequency, ties
    * broken by (a, b) ascending. Stops early when no adjacent pair
    * occurs at least twice (merging singletons only memorizes the
    * corpus). Returns merges in rank order (rank 1 first). */
  def trainMerges(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordFreqs
      .map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val out = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      val candidates = counts.filter(_._2 >= 2L)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        words = words.map { case (syms, f) => (mergePair(syms, best), f) }
        r += 1
      }
    }
    out.result()
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        buf += syms(i) + syms(i + 1); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  /** Greedy apply for one word (see object doc for semantics). */
  def tokenizeWord(word: String, ranks: java.util.HashMap[String, Int]): mutable.ArrayBuffer[String] = {
    val syms = mutable.ArrayBuffer.tabulate(word.length)(i => word.substring(i, i + 1))
    var more = true
    while (more && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrDefault(syms(i) + " " + syms(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) more = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
      }
    }
    syms
  }
}

/** `array<string>` of BPE pieces for a whole text column: lowercase,
  * split into `[a-z0-9]+` word runs, tokenize each word against the
  * merge table, concatenate in order. One map-only expression call per
  * row; the merge table rides inside the expression (bounded — it is a
  * vocabulary, validated at construction). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  require(merges.size <= (1 << 17),
    s"graft_bpe_tokens: merge table has ${merges.size} entries — a BPE " +
      "vocabulary is bounded by construction; cap it (<= 131072)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tokens expects string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val ranks: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, i + 1)
    }
    m
  }

  /** The whole per-row pass, called from both eval paths. */
  def tokenizeText(s: UTF8String): ArrayData = {
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    val pieces = mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = text.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        Bpe.tokenizeWord(text.substring(i, j), ranks)
          .foreach(p => pieces += UTF8String.fromString(p))
        i = j
      } else i += 1
    }
    new GenericArrayData(pieces.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    tokenizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the tokenizer is a reference-object call (like SrpSig's
      // hyperplanes): the surrounding operator stays inside
      // WholeStageCodegen, the per-row work is one virtual call
      val ref = ctx.addReferenceObj("bpe", this, classOf[BpeTokens].getName)
      s"${ev.value} = $ref.tokenizeText($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
