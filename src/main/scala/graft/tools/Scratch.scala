package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Dev scratchpad (not part of the query contract). Current probe: can
  * Spark's runtime bloom-filter join pruning be made to fire at fixture
  * scale (thresholds lowered on a cloned session)? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = Bridge.cloneSession(spark)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val l = graft.Tables.t(s, dir, "lineitem")
    val o = graft.Tables.t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val p = j.queryExecution.executedPlan.toString
    println("HAS_BLOOM=" + p.contains("bloom_filter_might_contain"))
    println(p.take(4000))
    spark.stop(); sys.exit(0)
  }
}
