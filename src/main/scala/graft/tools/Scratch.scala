package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the query contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.t(spark, dir, "documents")
      .withColumn("toks", array_distinct(split(lower(col("text")), " ")))
    val sig = graft.operators.MinHashDedup.signatures(docs, "doc_id", "toks")
    val b = graft.operators.MinHashDedup.banded(sig, "doc_id")
    println("== token-set band bucket sizes ==")
    b.groupBy("band_idx", "bh").count()
      .groupBy("count").agg(count(lit(1)).as("n_buckets"))
      .orderBy(desc("count")).show(10)
    // 3-shingle variant
    val sh = graft.Tables.t(spark, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("sh", expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', element_at(toks, i), element_at(toks, least(i + 1, size(toks))), element_at(toks, least(i + 2, size(toks)))))"))
    val sig2 = graft.operators.MinHashDedup.signatures(sh, "doc_id", "sh")
    val b2 = graft.operators.MinHashDedup.banded(sig2, "doc_id")
    println("== 3-shingle band bucket sizes ==")
    b2.groupBy("band_idx", "bh").count()
      .groupBy("count").agg(count(lit(1)).as("n_buckets"))
      .orderBy(desc("count")).show(10)
    spark.stop(); sys.exit(0)
  }
}
