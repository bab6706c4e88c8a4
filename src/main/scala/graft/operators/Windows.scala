package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** §2.E window functions + §2.H batch twins of the streaming windows
  * (SURVEY.md). The twins pin down tumbling/sliding/session semantics in
  * pure relational form so the DuckDB oracle can check them; the streaming
  * variants in graft.streaming reuse the same shapes.
  *
  * Scale notes: every window here partitions by a key (user_id, segment,
  * custkey) — one shuffle, then per-partition sort; no global sort. Window
  * start timestamps are emitted as epoch-second BIGINTs so the oracle
  * compare never depends on timestamp-zone rendering.
  */
object Windows {

  val queries: Map[String, QFn] = Map(
    // 2-D skyline (Pareto frontier) over (price, size) — the
    // multi-objective "best tradeoffs" operator (cheapest for its size /
    // smallest for its price; no other part is ≤ in both with one
    // strict), a classic relational operator family the rest of §2
    // lacked. The sweep formulation makes it one sort, not a self-join:
    // collapse to the (cents, size) value grain, keep the min size per
    // price (equal-price larger sizes are dominated within the group),
    // then a point survives iff its size beats the RUNNING MIN over all
    // strictly cheaper points — a rows-frame prefix min over the
    // distinct-price frame (value-grain bounded; the naive dominance
    // self-join is O(n²) and never runs). All-integer comparisons.
    "win_skyline_2d" -> ((s, dir) => {
      val pts = t(s, dir, "part")
        .select(expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)")
          .as("cents"), col("p_size").as("size"))
        .groupBy(col("cents"), col("size")).agg(count(lit(1)).as("n"))
      val perPrice = pts.groupBy(col("cents"))
        .agg(min(col("size")).as("size"))
        .join(pts, Seq("cents", "size"))
      val w = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perPrice.withColumn("runmin", min(col("size")).over(w))
        .filter(col("runmin").isNull || col("size") < col("runmin"))
        .select(round(col("cents").cast("double") / 100.0, 6).as("price"),
          col("size"), col("n").as("n_parts"))
        .orderBy(col("price"))
    }),

    "win_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(
          col("event_id"), col("user_id"),
          coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_id"),
          coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_id"),
          coalesce(col("us") - lag(col("us"), 1).over(w), lit(-1L)).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    "win_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(
          col("event_id"), col("user_id"),
          round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 6).as("run_sum"),
          round(avg(col("value")).over(w.rowsBetween(-2, 0)), 6).as("mov_avg"))
        .orderBy(col("event_id"))
    }),

    "win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("es"))
        .rangeBetween(-604800L, 0L)
      t(s, dir, "orders")
        .withColumn("es", unix_timestamp(col("o_orderdate")))
        .select(
          col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice")).over(w), 6).as("sum_7d"))
        .orderBy(col("o_orderkey"))
    }),

    // TIME-interval range frame — win_range_frame's day-grain cousin at
    // full microsecond precision: each event sees its user's trailing-hour
    // activity (count + value sum), the velocity/rate-limit feature every
    // fraud and engagement model computes. The range key is integer
    // epoch-MICROSECONDS on both engines (sub-second parts are real in
    // the fixture — second-truncation would silently shift frame edges);
    // the value sum rides integer micro-units, so the frame is exact end
    // to end. One shuffle on user_id, per-partition sort — no global sort.
    "win_time_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-3599999999L, 0L)
      events(s, dir)
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("v6", expr("CAST(round(value * 1000000, 0) AS BIGINT)"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("v6")).over(w).cast("double") / 1e6, 6).as("sum_value_1h"))
        .orderBy(col("event_id"))
    }),

    "win_analytic" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"),
          first(col("c_custkey")).over(wFull).as("poorest"),
          last(col("c_custkey")).over(wFull).as("richest"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),

    // nth_value surface — the positional picks between first/last (the
    // "runner-up per group" question): 2nd- and 3rd-poorest customer
    // ids per segment over the SAME total (balance, custkey) order
    // win_analytic pins, full-frame so every row sees the answer; one
    // window sort per partition, codegen'd.
    "win_nth_value" -> ((s, dir) => {
      val wf = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          nth_value(col("c_custkey"), 2).over(wf).as("second_poorest"),
          nth_value(col("c_custkey"), 3).over(wf).as("third_poorest"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),

    "topk_per_group" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val spend = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("spend").desc, col("c_custkey"))
      spend.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // SAME result as topk_per_group through a bounded-heap AGGREGATE
    // (Spark's CollectTopK via the graftbridge-style shim) instead of a
    // rank window: each group keeps a 3-element heap, partials merge
    // map-side (ObjectHashAggregate), and nothing is ever sorted beyond
    // 3 rows per group. At scale that replaces a full per-partition sort
    // of every group's rows with O(n log k) heap pushes — the window form
    // sorts ALL rows per segment to discard all but 3. The ordering key
    // struct((-spend), custkey) makes "spend desc, custkey asc" the
    // lexicographic MIN order, so ties break engine-identically; the
    // returned array is ascending = rank order. Checked against the
    // identical oracle as the window twin.
    "topk_per_group_agg" -> ((s, dir) => {
      import org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopK
      import org.apache.spark.sql.graftbridge.Bridge
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val spend = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      val key = struct((-col("spend")).as("ns"), col("c_custkey").as("ck"))
      val tk = Bridge.column(GraftTopK
        .collectTopK(Bridge.expression(key), 3, reverse = true)
        .toAggregateExpression())
      spend.groupBy(col("c_mktsegment"))
        .agg(tk.as("tk"))
        .select(col("c_mktsegment"), posexplode(col("tk")).as(Seq("pos", "st")))
        .select(col("c_mktsegment"), col("st.ck").as("c_custkey"),
          (-col("st.ns")).as("spend"), (col("pos") + 1).as("rn"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // ---- §2.H batch twins (oracle-checked semantics for the streams) ----
    "win_tumbling_batch" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        .select(
          unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"), col("v"))
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    "win_sliding_batch" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        .select(
          unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"), col("v"))
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    "win_session_batch" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L, 1)
            .when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sid", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .orderBy(col("user_id"), col("sid"))
    }))

  val oracles: Map[String, String] = Map(
    "win_skyline_2d" ->
      """WITH pts AS (
           SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                  p_size AS sz, count(1) AS n
           FROM part GROUP BY 1, 2),
         pp AS (
           SELECT p.cents, p.sz, p.n FROM pts p
           JOIN (SELECT cents, min(sz) AS sz FROM pts GROUP BY cents) m
             ON p.cents = m.cents AND p.sz = m.sz),
         r AS (
           SELECT cents, sz, n,
                  min(sz) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmin
           FROM pp)
         SELECT round(CAST(cents AS DOUBLE) / 100.0, 6) AS price,
                CAST(sz AS INTEGER) AS size, CAST(n AS BIGINT) AS n_parts
         FROM r WHERE runmin IS NULL OR sz < runmin
         ORDER BY price""",
    "win_rank" ->
      """SELECT c_custkey, c_mktsegment,
         row_number() OVER w AS rn, rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC NULLS LAST, c_custkey)
         ORDER BY c_mktsegment, rn""",
    "win_lag_lead" ->
      """SELECT event_id, user_id,
         coalesce(lag(event_id, 1) OVER w, -1) AS prev_id,
         coalesce(lead(event_id, 1) OVER w, -1) AS next_id,
         coalesce(epoch_us(ts) - lag(epoch_us(ts), 1) OVER w, -1) AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY event_id""",
    "win_running" ->
      """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_sum,
         round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg
         FROM events ORDER BY event_id""",
    "win_range_frame" ->
      """SELECT o_orderkey, o_custkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 1000000
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 6) AS sum_7d
         FROM orders ORDER BY o_orderkey""",
    "win_time_range" ->
      """SELECT event_id, user_id,
         count(1) OVER w AS n_1h,
         round(CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w AS DOUBLE)
           / 1000000.0, 6) AS sum_value_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "win_analytic" ->
      """SELECT c_custkey, c_mktsegment,
         first_value(c_custkey) OVER wf AS poorest,
         last_value(c_custkey) OVER wf AS richest,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
                wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_mktsegment, c_custkey""",
    "win_nth_value" ->
      """SELECT c_custkey, c_mktsegment,
         nth_value(c_custkey, 2) OVER wf AS second_poorest,
         nth_value(c_custkey, 3) OVER wf AS third_poorest
         FROM customer
         WINDOW wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_mktsegment, c_custkey""",
    "topk_per_group" ->
      """SELECT * FROM (
           SELECT c_mktsegment, c_custkey,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS spend,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) DESC, c_custkey) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, c_custkey)
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "topk_per_group_agg" ->
      """SELECT * FROM (
           SELECT c_mktsegment, c_custkey,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS spend,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) DESC, c_custkey) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment, c_custkey)
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "win_tumbling_batch" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS w_start_s, event_type,
         count(1) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
         FROM events GROUP BY 1, 2 ORDER BY w_start_s, event_type""",
    "win_sliding_batch" ->
      """SELECT ((epoch_us(ts) // 300000000) - i) * 300 AS w_start_s, event_type,
         count(1) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
         FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
         GROUP BY 1, 2 ORDER BY w_start_s, event_type""",
    "win_session_batch" ->
      """SELECT user_id, sid, count(1) AS n_events,
         min(us) AS start_us, max(us) AS end_us
         FROM (
           SELECT user_id, event_id, us,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
           FROM (
             SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
                    THEN 1
                    WHEN lag(epoch_us(ts), 1)
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
             FROM events))
         GROUP BY user_id, sid ORDER BY user_id, sid"""
  ).map { case (k, v) => k -> v.replaceAll("\\s+", " ").trim }
}
