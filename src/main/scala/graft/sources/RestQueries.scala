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
    }))

  val oracles: Map[String, String] = Map.empty
}
