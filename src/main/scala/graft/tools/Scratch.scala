package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DistRank

/** Dev scratchpad (not part of the query contract). Current probe:
  * chained DistRank calls (rfm shape) vs reference windows at sf0.1. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val o = graft.Tables.t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("day"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val per = o.groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
    val horizon = o.agg(max(col("day")).as("h_day"))
    val base = per.crossJoin(broadcast(horizon))
      .withColumn("recency_days", datediff(col("h_day"), col("last_day")))
    val r1 = DistRank.withRank(base,
      Seq(col("recency_days").desc, col("o_custkey")), "r_rn", Some("nn"))
    val r2 = DistRank.withRank(r1, Seq(col("frequency"), col("o_custkey")), "f_rn")
    val r3 = DistRank.withRank(r2, Seq(col("monetary_cents"), col("o_custkey")), "m_rn")
    import org.apache.spark.sql.expressions.Window
    val ref = base
      .withColumn("rr", row_number().over(Window.orderBy(col("recency_days").desc, col("o_custkey"))).cast("long"))
      .withColumn("fr", row_number().over(Window.orderBy(col("frequency"), col("o_custkey"))).cast("long"))
      .withColumn("mr", row_number().over(Window.orderBy(col("monetary_cents"), col("o_custkey"))).cast("long"))
      .select(col("o_custkey").as("ck2"), col("rr"), col("fr"), col("mr"))
    val j = r3.join(ref, col("o_custkey") === col("ck2"))
    val bad = j.filter(col("r_rn") =!= col("rr") || col("f_rn") =!= col("fr") || col("m_rn") =!= col("mr"))
    println("N_MISMATCH=" + bad.count())
    bad.select("o_custkey", "r_rn", "rr", "f_rn", "fr", "m_rn", "mr")
      .orderBy("o_custkey").limit(8).collect().foreach(r => println("BAD=" + r.mkString(",")))
    spark.stop(); sys.exit(0)
  }
}
