package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2.M2 — typed UDAF: exact geometric mean via log-domain sums.
  *
  * Buffer is (Σ ln x, count); merge is associative+commutative, so the
  * two-phase (partial → final) distributed aggregation is correct at any
  * partition count — the 100 TB posture is identical to a built-in avg.
  * Output is consumed rounded to 6 dp (D-rule 7): double-sum ordering
  * across partitions can differ from the oracle's by ~1 ulp, absorbed by
  * the rounding at these data scales.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
