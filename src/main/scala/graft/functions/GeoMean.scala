package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** §2.J `agg_custom_udaf`: typed Aggregator computing the geometric mean
  * of a positive double column as exp(mean(ln x)).
  *
  * The buffer is (sum of logs, count); merge is associative+commutative so
  * Spark can combine partial states map-side before the shuffle, exactly
  * like a built-in declarative aggregate. Log magnitudes are ~10, so the
  * double summation error stays far below the 6-dp rounding applied by the
  * caller even under nondeterministic partial-merge order.
  */
object GeoMean {
  case class Buf(var logSum: Double, var n: Long)

  val agg: Aggregator[Double, Buf, Double] = new Aggregator[Double, Buf, Double] {
    def zero: Buf = Buf(0.0, 0L)
    def reduce(b: Buf, x: Double): Buf = {
      if (x > 0) { b.logSum += math.log(x); b.n += 1 }
      b
    }
    def merge(a: Buf, b: Buf): Buf = Buf(a.logSum + b.logSum, a.n + b.n)
    def finish(b: Buf): Double = if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private lazy val fn = udaf(agg)

  def geoMean(c: Column): Column = fn(c)
}
