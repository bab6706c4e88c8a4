package graft

import org.apache.spark.sql.functions._

/** Native as-of join (graft.plans.AsofJoin): plan shape + exact equality
  * with the windowed emulation the DuckDB oracle checks. */
class AsofJoinSpec extends SparkSuite {

  test("native asof physical plan contains AsofJoinExec (not a range join)") {
    val df = q("join_asof_native")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2000))
  }

  test("native asof == windowed emulation, row for row") {
    val native = q("join_asof_native").collect().map(_.toSeq).toSeq
    val emulated = q("join_asof").collect().map(_.toSeq).toSeq
    assert(native === emulated)
  }

  test("left rows with no prior right row null-extend (coalesce to -1)") {
    val n = q("join_asof_native").filter(col("prior_view_id") === -1).count()
    assert(n > 0, "expected some purchases with no prior view at sf0.001")
  }

  test("native FORWARD mode == join_asof_forward emulation, row for row") {
    val native = q("join_asof_native_forward").collect().map(_.toSeq).toSeq
    val emulated = q("join_asof_forward").collect().map(_.toSeq).toSeq
    assert(native === emulated)
  }

  test("native NEAREST mode == join_asof_nearest emulation, row for row") {
    val native = q("join_asof_native_nearest").collect().map(_.toSeq).toSeq
    val emulated = q("join_asof_nearest").collect().map(_.toSeq).toSeq
    assert(native === emulated)
  }

  test("forward/nearest modes still plan the sorted-merge exec, not a pair join") {
    for (name <- Seq("join_asof_native_forward", "join_asof_native_nearest")) {
      val plan = q(name).queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"), s"$name: ${plan.take(2000)}")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name: ${plan.take(2000)}")
    }
  }

  test("native TOLERANCE mode == join_asof_tolerance emulation, row for row") {
    val native = q("join_asof_tolerance_native").collect().map(_.toSeq).toSeq
    val emulated = q("join_asof_tolerance").collect().map(_.toSeq).toSeq
    assert(native === emulated)
  }

  test("tolerance bound on synthetic edges: out-of-bound candidates are non-matches, boundary is inclusive") {
    import spark.implicits._
    import graft.plans.{AsofJoinApi, AsofMode}
    val left = Seq((1L, 10L, 100L), (2L, 50L, 200L)).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 8L, 3L), (1L, 8L, 7L), (1L, 12L, 2L), (1L, 12L, 5L), (1L, 10L, 9L)
    ).toDF("rk", "rt", "tie")
    def run(mode: AsofMode, tol: Long) =
      AsofJoinApi.asofJoin(left, right, "k", "rk", "t", "rt", "tie", mode,
          toleranceMicros = Some(tol))
        .select(col("lid"), col("tie")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // backward candidate sits at distance 2: bound 1 excludes, bound 2
    // (inclusive) admits the run's greatest tie
    assert(run(AsofMode.Backward, 1L) === Map(100L -> -1L, 200L -> -1L))
    assert(run(AsofMode.Backward, 2L) === Map(100L -> 7L, 200L -> -1L))
    // forward mirror
    assert(run(AsofMode.Forward, 1L) === Map(100L -> -1L, 200L -> -1L))
    assert(run(AsofMode.Forward, 2L) === Map(100L -> 2L, 200L -> -1L))
    // nearest: the equal-ts distance-0 row survives any bound
    assert(run(AsofMode.Nearest, 1L) === Map(100L -> 9L, 200L -> -1L))
  }

  test("mode tie-breaks on synthetic edges: equal ts runs, distance ties, equal-ts match") {
    import spark.implicits._
    import graft.plans.{AsofJoinApi, AsofMode}
    // left probes at t=10 (key 1) and t=50 (key 2, no right rows)
    val left = Seq((1L, 10L, 100L), (2L, 50L, 200L)).toDF("k", "t", "lid")
    // key 1 right rows: behind run at t=8 (ties 3,7), ahead run at t=12
    // (ties 2,5) — equal |Δ|=2 both sides; plus an equal-ts row at t=10
    // for the nearest dist-0 case (tie 9)
    val right = Seq(
      (1L, 8L, 3L), (1L, 8L, 7L), (1L, 12L, 2L), (1L, 12L, 5L), (1L, 10L, 9L)
    ).toDF("rk", "rt", "tie")
    def run(mode: AsofMode, excludeEq: Boolean = false) = {
      val r = if (excludeEq) right.filter(col("rt") =!= 10L) else right
      AsofJoinApi.asofJoin(left, r, "k", "rk", "t", "rt", "tie", mode)
        .select(col("lid"), col("tie")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    }
    // backward: greatest ts strictly before (8), greatest tie in the run (7)
    assert(run(AsofMode.Backward) === Map(100L -> 7L, 200L -> -1L))
    // forward: smallest ts strictly after (12), smallest tie (2)
    assert(run(AsofMode.Forward) === Map(100L -> 2L, 200L -> -1L))
    // nearest with an equal-ts row: distance 0 wins (tie 9)
    assert(run(AsofMode.Nearest) === Map(100L -> 9L, 200L -> -1L))
    // nearest without it: |Δ|=2 both directions — backward wins, and
    // within the run the SMALLEST tie (3), unlike backward mode's 7
    assert(run(AsofMode.Nearest, excludeEq = true) === Map(100L -> 3L, 200L -> -1L))
  }
}
