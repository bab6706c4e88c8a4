package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the query contract). Current probe: dump
  * text_dedup_near's candidate pairs on sf0.001 so the regression spec can
  * pin them (the query has no DuckDB oracle). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rows = graft.SparkEntry.queries("text_dedup_near")(spark, dir).collect()
    println("PAIRS " + rows.map(r =>
      s"(${r.getLong(0)}L, ${r.getLong(1)}L, ${r.getLong(2)}L)").mkString(", "))
    spark.stop(); sys.exit(0)
  }
}
