package graft

/** Scale-layout patterns: the bucketed join must plan WITHOUT a shuffle on
  * either side; the salted join must equal the plain join. */
class ScaleOpsSpec extends SparkSuite {

  test("bucketed join has no shuffle exchange on either join side") {
    val df = q("join_bucketed") // first call writes the bucketed tables
    val plan = df.queryExecution.executedPlan.toString
    // the agg/sort may exchange on their own keys; the JOIN must consume
    // bucketed scans directly — no exchange on either join key
    assert(plan.contains("Bucketed: true"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(o_custkey")
      && !plan.contains("Exchange hashpartitioning(c_custkey"), plan.take(3000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(1000))
  }

  test("salted skew join equals the plain join result") {
    import org.apache.spark.sql.functions._
    val salted = q("join_skew_salted").collect().map(_.toSeq).toSeq
    val e = graft.Tables.events(spark, sf)
    val dim = e.groupBy(col("user_id").as("d_user"))
      .agg(countDistinct(col("event_type")).as("n_types"))
    val plain = e.join(dim, e("user_id") === dim("d_user"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("n_types")).as("n_types"))
      .orderBy(col("user_id")).collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }
}
