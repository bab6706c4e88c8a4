package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed global rank / running sum.
  *
  * `Window.orderBy(...)` with no partition key funnels its ENTIRE input
  * through one task — fine on a frame whose grain is bounded by
  * construction (vocabulary, value domain, calendar days), a scale-killer
  * on any grain that grows with the fact (customers, users, samples of
  * the fact). TPC-H at 100 TB carries ~15 B customers; a single-partition
  * ntile over that frame is the one shape that cannot survive.
  *
  * This is the classic two-phase rank instead:
  *
  *  1. '''range phase''': `repartitionByRange(P, order)` splits the frame
  *     into P key-ordered slices (ascending in partition id — Spark's
  *     RangePartitioner contract), then a window PARTITIONED by
  *     `spark_partition_id()` computes the local `row_number` (and local
  *     running sum) inside each slice. No task ever sees more than ~1/P
  *     of the frame.
  *  2. '''offset phase''': per-partition counts/sums aggregate to P rows
  *     (P = shuffle width, bounded by cluster config, NOT by data), the
  *     exclusive prefix sum over those P rows yields each slice's global
  *     offset, and a broadcast join adds `offset + local` back. The only
  *     single-partition window in the plan runs over that P-row frame —
  *     the `_drk_` column marker is what the PlanSpec fact-grain-window
  *     lint keys its exemption on.
  *
  * The caller's `order` MUST be a total order (append a unique
  * tiebreaker): then the result is bit-identical to the single-partition
  * `row_number`/`sum` whatever boundaries RangePartitioner samples,
  * because ranks of a unique order don't depend on where the cuts fall.
  */
object DistRank {

  /** Append a 1-based global rank column `rnName` over `order`.
    *
    * @param nName  also append the total row count (same value every row)
    * @param cum    also append `(valueCol, name)`: the inclusive running
    *               sum of `valueCol` in rank order
    * @param cumTotName also append the grand total of the cum column
    */
  def withRank(
      df: DataFrame,
      order: Seq[Column],
      rnName: String,
      nName: Option[String] = None,
      cum: Option[(Column, String)] = None,
      cumTotName: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("_drk_pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("_drk_pid")).orderBy(order: _*)
    // eager localCheckpoint: `local` feeds BOTH the offset aggregation and
    // the final join, and RangePartitioner's boundary sampling is seeded
    // by RDD id — two separate materializations of this subtree can cut
    // DIFFERENT boundaries, making the offsets inconsistent with the
    // local ranks they're added to (observed as ±100-row rank drift in
    // chained calls where exchange reuse didn't kick in). One pinned
    // materialization makes pid/rank/offset mutually consistent whatever
    // boundaries the sampler picked; the ranks themselves are
    // boundary-invariant because the caller's order is total.
    val local = cum.foldLeft(
      ranged.withColumn("_drk_lrn", row_number().over(wLoc).cast("long"))
    ) { case (acc, (c, _)) =>
      acc.withColumn("_drk_lcs",
        sum(c).over(wLoc.rowsBetween(Window.unboundedPreceding, 0)))
    }.transform(RoundPin.pin)
    // P rows — one per non-empty slice; empty slices contribute nothing
    // (their count is 0, so skipping them leaves every prefix sum intact).
    // The slice's cum total is sum(c) over the slice, NOT max(_drk_lcs):
    // max of a running sum equals the slice sum only when every value is
    // non-negative — a negative-valued cum column would silently corrupt
    // every downstream slice's offset (ADVICE r11; covered by the
    // negative-weight PropertySpec replay).
    val totAggs = Seq(max(col("_drk_lrn")).as("_drk_cnt")) ++
      cum.map { case (c, _) => sum(c).as("_drk_csum") }
    val tots = local.groupBy(col("_drk_pid")).agg(totAggs.head, totAggs.tail: _*)
    // exclusive prefix over the P-row frame: the only global window here,
    // bounded by shuffle width by construction (lint exemption: _drk_)
    val wOff = Window.orderBy(col("_drk_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off0 = tots.withColumn("_drk_off",
      coalesce(sum(col("_drk_cnt")).over(wOff), lit(0L)))
    val off1 = nName.fold(off0)(_ =>
      off0.withColumn("_drk_n", sum(col("_drk_cnt")).over(wAll)))
    val off2 = cum.fold(off1)(_ =>
      off1.withColumn("_drk_coff",
        coalesce(sum(col("_drk_csum")).over(wOff), lit(0L))))
    val off = cumTotName.fold(off2)(_ =>
      off2.withColumn("_drk_ctot", sum(col("_drk_csum")).over(wAll)))
      .drop("_drk_cnt", "_drk_csum")
    val joined = local.join(broadcast(off), Seq("_drk_pid"))
      .withColumn(rnName, col("_drk_off") + col("_drk_lrn"))
    val withN = nName.fold(joined)(n => joined.withColumn(n, col("_drk_n")))
    val withCum = cum.fold(withN) { case (_, name) =>
      withN.withColumn(name, col("_drk_coff") + col("_drk_lcs"))
    }
    val withTot = cumTotName.fold(withCum)(tn =>
      withCum.withColumn(tn, col("_drk_ctot")))
    withTot.drop("_drk_pid", "_drk_lrn", "_drk_lcs",
      "_drk_off", "_drk_n", "_drk_coff", "_drk_ctot")
  }

  /** Exact integer division for non-negative longs. Plain `/` on Columns
    * is DOUBLE division + truncation, which mis-rounds once the dividend
    * outgrows the double ulp gap (~2^50 with small divisors) — `a - a%b`
    * is an exact multiple of `b`, and IEEE division of two exactly
    * representable operands with an integral quotient is exact. */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** SQL-standard `ntile(k)` derived from a rank + total count computed by
    * [[withRank]]: the first `n % k` buckets take `n/k + 1` rows, the rest
    * take `n/k` — the exact rule Spark's NTile and DuckDB's ntile share,
    * so oracles written with native ntile keep matching. Integer-only. */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val q = idiv(n, kL)
    val r = n % kL
    val headRows = r * (q + lit(1L))
    when(rn <= headRows, idiv(rn - 1, q + lit(1L)) + 1)
      .otherwise(r + idiv(rn - headRows - 1, greatest(q, lit(1L))) + 1)
  }
}
