package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-Minimum-Values distinct sketch (`agg_kmv_setops`): keep the K
  * smallest distinct hash values of a column; estimate the distinct count
  * from the K-th minimum. Unlike `collect_set` (state grows with the
  * distinct count — unusable at 100 TB), the buffer here is HARD-BOUNDED
  * at K longs per group, and `merge` (K smallest of the concatenation) is
  * associative + commutative, so partial states combine map-side and only
  * fixed-size arrays ever shuffle — the same contract every production
  * sketch (HLL, theta, KMV) is built on.
  *
  * What KMV adds over the HLL the engine already carries
  * (`agg_hll_merge`): the kept minima form a UNIFORM SAMPLE of the hash
  * space, so two sketches support SET ALGEBRA — union (merge K smallest)
  * and intersection (Jaccard from the union sketch's members) — not just
  * cardinality. That set algebra is the query surface `agg_kmv_setops`
  * exercises pairwise across event types.
  *
  * Estimator (hash domain [0, 2^32)): a full sketch holds K order
  * statistics of a uniform sample, so E[h_K] ≈ K/(n+1)·2^32 and
  * n̂ = (K−1)·2^32/h_K; a non-full sketch saw every distinct value and is
  * exact. The hash is the engine's usual deterministic multiplicative mix
  * (id·2654435761 mod 2^32 — same family as sample_split's), NOT an
  * opaque xxhash64, precisely so DuckDB can replay sketch construction
  * bit for bit and the whole lifecycle carries a value oracle.
  */
object KmvSketch {
  val K = 64

  /** Sorted distinct array of ≤ K smallest hashes. Arrays at this size
    * beat trees: reduce is a binary search + insert into ≤512 bytes. */
  val agg: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.emptyLongArray

      def reduce(b: Array[Long], h: Long): Array[Long] = {
        if (b.length == K && h >= b(K - 1)) return b
        val i = java.util.Arrays.binarySearch(b, h)
        if (i >= 0) return b // already present
        val at = -i - 1
        val n = math.min(b.length + 1, K)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, at)
        out(at) = h
        System.arraycopy(b, at, out, at + 1, math.min(b.length, n - 1) - at)
        out
      }

      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        // merge two sorted distinct arrays, keep K smallest distinct
        val out = new Array[Long](math.min(a.length + b.length, K))
        var i = 0; var j = 0; var k = 0
        while (k < out.length && (i < a.length || j < b.length)) {
          val take =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
            else { val v = b(j); j += 1; v }
          if (k == 0 || out(k - 1) != take) { out(k) = take; k += 1 }
        }
        if (k == out.length) out else java.util.Arrays.copyOf(out, k)
      }

      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] = ExprEnc.longArray
      def outputEncoder: Encoder[Array[Long]] = ExprEnc.longArray
    }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  private lazy val fn = udaf(agg)

  /** KMV sketch aggregate over a pre-hashed long column. */
  def kmv(c: Column): Column = fn(c)
}
