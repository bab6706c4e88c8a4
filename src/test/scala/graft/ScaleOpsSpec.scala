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

  test("bucketed interval-overlap join equals the naive theta join, as a hash join") {
    import org.apache.spark.sql.functions._
    val df = q("join_interval_overlap")
    // semantics: identical pairs to the O(n*m) range-predicate join
    def side(parity: Int, p: String) = graft.Tables.t(spark, sf, "orders")
      .filter(pmod(col("o_orderkey"), lit(25)) === parity)
      .select(
        col("o_orderkey").as(s"${p}_key"),
        col("o_orderdate").cast("date").as(s"${p}_s"),
        date_add(col("o_orderdate").cast("date"),
          (pmod(col("o_orderkey"), lit(5)) + 1).cast("int")).as(s"${p}_e"))
    val naive = side(0, "a").join(side(1, "b"),
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_key"), col("b_key"),
        (datediff(least(col("a_e"), col("b_e")),
          greatest(col("a_s"), col("b_s"))) + 1).cast("long").as("overlap_days"))
      .orderBy(col("a_key"), col("b_key"))
    assert(df.collect().map(_.toSeq).toSeq === naive.collect().map(_.toSeq).toSeq)
    // plan: the overlap predicate must ride a bucket EQUI-join, not a
    // nested loop over both interval sets
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(1000))
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
