package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopK
import org.apache.spark.sql.graftbridge.Bridge

/** Dev scratchpad (not part of the query contract). Current probe: pin
  * CollectTopK's `reverse` semantics (which flag keeps the smallest
  * structs, and the order of the returned array). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 30.0), (1, 20.0), (1, 40.0), (2, 5.0))
      .toDF("g", "v")
    def topk(rev: Boolean) = {
      val st = struct(col("v"), col("g"))
      val agg = Bridge.column(
        GraftTopK.collectTopK(Bridge.expression(st), 2, rev).toAggregateExpression())
      df.groupBy(col("g")).agg(agg.as("tk")).orderBy(col("g"))
        .collect().toSeq
    }
    println("reverse=false: " + topk(false))
    println("reverse=true:  " + topk(true))
    spark.stop(); sys.exit(0)
  }
}
