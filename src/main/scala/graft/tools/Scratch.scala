package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the query contract). Current probe: where
  * dedup_cluster's cold time goes — the Jaccard pair graph vs the HashMin
  * fixpoint loop vs first-query session warmup. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    time("warmup agg_group") {
      graft.SparkEntry.queries("agg_group")(spark, dir).count()
    }
    time("jaccard pairs (count)") {
      graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count()
    }
    time("dedup_cluster (count)") {
      graft.SparkEntry.queries("dedup_cluster")(spark, dir).count()
    }
    time("dedup_cluster (memoized)") {
      graft.SparkEntry.queries("dedup_cluster")(spark, dir).count()
    }
    spark.stop(); sys.exit(0)
  }
}
