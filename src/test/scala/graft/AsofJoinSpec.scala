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
}
