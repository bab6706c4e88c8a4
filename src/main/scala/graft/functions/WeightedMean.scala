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

  def weightedMean(w: Column, x: Column): Column = fn(w, x)
}
