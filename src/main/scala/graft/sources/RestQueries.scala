package graft.sources

import org.apache.spark.sql.functions._
import graft.Tables._

/** Registers the rest_source connector as a runnable query: spins up the
  * in-JVM stub API (deterministic data, independent of sfDir) and reads it
  * through the DSv2 path. No DuckDB oracle (the API is not a parquet
  * table); the unit suite covers pushdown, auth, pagination and the four
  * failure classes. */
object RestQueries {
  private lazy val stub = RestStubServer.start(totalRows = 1000L)

  val queries: Map[String, QFn] = Map(
    "rest_source" -> ((s, _) => {
      s.read.format("graft.sources.RestSource")
        .option("url", stub.url)
        .option("pages", "20")
        .option("pageSize", "50")
        .load()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
        .orderBy(col("event_type"))
    }),

    "etl_end_to_end" -> ((s, dir) => etlEndToEnd(s, dir)))

  /** The reference's full pipeline (README.md:21-34) as ONE query:
    * extract (paginated REST, DSv2) → transform (clean/cast) → validate
    * (rule tagging) → load (audit columns + keyed upsert) → summarize.
    * No oracle (the API is not a parquet table); deterministic stub data,
    * asserted in the unit suite. */
  val etlEndToEnd: graft.Tables.QFn = (s, _) => {
    import org.apache.spark.sql.expressions.Window
    val extracted = s.read.format("graft.sources.RestSource")
      .option("url", stub.url).option("pages", "20").option("pageSize", "50")
      .load()
    val transformed = extracted
      .withColumn("event_type", lower(trim(col("event_type"))))
      .withColumn("value", col("value").cast("double"))
    val validated = transformed.withColumn("_valid",
      col("value") >= 0 && col("event_type").isin("click", "view", "purchase", "signup", "error"))
    val audited = validated.filter(col("_valid"))
      .withColumn("_ingested_at", lit("2026-01-01 00:00:00").cast("timestamp"))
      .withColumn("_source", lit("rest_stub"))
    // idempotent load: keyed upsert (latest _ingested_at wins)
    val w = Window.partitionBy(col("event_id")).orderBy(col("_ingested_at").desc)
    val loaded = audited.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    loaded.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_loaded"), dsum(col("value")).as("v"))
      .orderBy(col("event_type"))
  }

  val oracles: Map[String, String] = Map.empty
}
