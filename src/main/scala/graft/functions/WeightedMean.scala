package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** §2.J `udaf_weighted`: typed Aggregator computing a weighted mean with an
  * EXACT integer buffer — the determinism-under-parallel-merge lesson of
  * GeoMean taken one step further.
  *
  * GeoMean can argue its double buffer's error sits below the caller's 6-dp
  * rounding because log magnitudes are ~10; a weighted PRICE mean cannot
  * (Σw·x reaches ~1e10 where accumulated double error crosses the 6-dp
  * half-unit of the ~1e4-scale mean under nondeterministic partial-merge
  * order). So the buffer carries integer CENTS: weight is integral and x
  * has 2 decimals, so round(w·x·100) is exact, Long sums are
  * order-independent by construction, and the single finish division is
  * the only inexact step — bit-identical at any parallelism and to the
  * DuckDB twin.
  */
object WeightedMean {
  case class Buf(var cents: Long, var w: Long)

  val agg: Aggregator[(Double, Double), Buf, Double] =
    new Aggregator[(Double, Double), Buf, Double] {
      def zero: Buf = Buf(0L, 0L)
      def reduce(b: Buf, in: (Double, Double)): Buf = {
        // the exactness contract REQUIRES integral weights — a fractional
        // w would be silently rounded into a wrong mean, so fail loudly
        // (per-row cost is one compare, noise next to the udaf dispatch)
        if (in._1 != math.rint(in._1))
          throw new IllegalArgumentException(
            s"weightedMean requires integral weights, got ${in._1}")
        b.cents += math.round(in._1 * in._2 * 100)
        b.w += math.round(in._1)
        b
      }
      def merge(a: Buf, b: Buf): Buf = Buf(a.cents + b.cents, a.w + b.w)
      def finish(b: Buf): Double =
        if (b.w == 0) Double.NaN else (b.cents.toDouble / 100.0) / b.w
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  private lazy val fn = udaf(agg)

  /** Weighted mean Σw·x / Σw with an exact integer-cents buffer.
    *
    * CONTRACT: `w` must be integral-valued (a count/quantity column) and
    * `x` at most 2-decimal (a price column) — that is what makes
    * round(w·x·100) exact and the buffer order-proof. A fractional
    * weight throws `IllegalArgumentException` at reduce time rather
    * than silently rounding into a wrong mean; a >2-dp `x` quantizes to
    * cents (document at the call site if that is acceptable). */
  def weightedMean(w: Column, x: Column): Column = fn(w, x)
}
