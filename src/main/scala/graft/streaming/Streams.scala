package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables.{dsum, t, EventTypes, QFn}

/** §2.H Structured Streaming operators (SURVEY.md): the reference's
  * continuous paginated pull + incremental load loop
  * (/root/reference/README.md:13,:24,:29,:33-34) re-expressed as
  * micro-batch streams over the events table.
  *
  * Each registered query runs a REAL streaming query (file source → memory
  * or foreachBatch sink) to completion via processAllAvailable, then
  * returns the materialized result — so the driver's harness exercises the
  * streaming engine, not a batch stand-in. Semantics are pinned by the
  * oracled batch twins in operators.Windows (win_*_batch) and the
  * MemoryStream unit specs (late data, duplicates, session gaps).
  *
  * Scale notes: all stateful aggs key their state by (window, type) or
  * user — state is hash-partitioned across executors by the same shuffle
  * as the batch twin; watermarks bound state growth; the upsert sink's
  * per-batch MERGE is the foreachBatch pattern that backs Delta/Iceberg
  * upserts on a real cluster (here: hash-partitioned target + dynamic
  * partition overwrite of only the buckets a batch touches).
  */
object Streams {

  // per-staged-dir memo of the events `ts` physical type (see eventsStream)
  private val tsTypeCache = new graft.ArtifactCache[DataType]("events ts type",
    _ => (), graft.ArtifactCache.KeyDriven(
      "schema-probe memo keyed by staged dir — one footer read, rebuilt " +
        "on demand; nothing dir-shaped to pre-build"))

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // overridden per-fixture; see eventsStream
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events parquet with µs timestamps.
    * The file-stream source needs a directory, so the single events file is
    * staged (symlinked) into a tmp dir per scale factor. All staging dirs
    * below are per-PID (like EtlOps/ScaleOps) so concurrent JVMs never race
    * on a non-atomic Overwrite of a shared fixture. */
  private[graft] def eventsStream(s: SparkSession, sfDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tag = graft.Tables.pathTag(sfDir)
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_stream_${ProcessHandle.current().pid()}", s"events_$tag")
    Files.createDirectories(dir)
    val link = dir.resolve("events.parquet")
    if (!Files.exists(link))
      Files.createSymbolicLink(link, Paths.get(sfDir, "events.parquet"))
    // the stream schema must match what the generator actually wrote for
    // `ts` (ns-INT64 in earlier drops, µs TIMESTAMP in current ones) — a
    // one-footer batch read resolves it, then ts normalizes to a session-tz
    // TIMESTAMP exactly like Tables.events does for the batch path. The
    // probe is MEMOIZED per staged dir (optimization r17): it is a
    // driver-side listing + footer read that every stream query's timed
    // region otherwise repays (twice for the dual-source interval join)
    // for a schema that is immutable per dir.
    val tsType = tsTypeCache.getOrElseUpdate(dir.toString,
      s.read.parquet(dir.toString).schema("ts").dataType)
    val schema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = s.readStream.schema(schema).parquet(dir.toString)
    if (tsType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Move the single part-file of a coalesce(1) staging write onto a fixed
    * name. Closes the directory stream (Files.list leaks the handle
    * otherwise) and refuses >1 part file — a blind REPLACE_EXISTING move
    * onto one destination would silently drop data. */
  private def moveSinglePart(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    val listing = Files.list(from)
    val parts =
      try listing.filter(_.toString.endsWith(".parquet")).toArray(new Array[java.nio.file.Path](_)).toSeq
      finally listing.close()
    require(parts.size == 1,
      s"expected exactly 1 part file in $from (coalesce(1) staging), got ${parts.size}")
    Files.move(parts.head, to, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Keyed MERGE of one micro-batch into a parquet "collection", rewriting
    * ONLY the hash-partitions the batch touches. The target is laid out as
    * `_pk = pmod(event_id, PK_BUCKETS)` partitions; existing rows are read
    * with a partition-pruning filter on the touched buckets, merged
    * keep-latest on `_batch`, and written back with dynamic partition
    * overwrite — per-batch cost is O(touched partitions), not O(target),
    * which is what keeps a continuous upsert viable at 100 TB.
    * (On a real cluster this is the Delta/Iceberg MERGE plan; the dynamic
    * overwrite is the transaction-log-less commit boundary.) */
  private[graft] val PK_BUCKETS = graft.Knobs.UpsertPkBucketsDefault

  /** The bucket count is the TARGET'S layout, not the session's opinion:
    * a merge keyed on a different count than the one the resident rows
    * were written with prunes those rows out of the merge read and
    * silently duplicates/loses updates. The count is therefore persisted
    * WITH the target (`_PK_BUCKETS` marker, written once at create) and
    * every later merge uses the marker — failing loudly if the session
    * conf disagrees, instead of trusting it (ADVICE r14). A pre-marker
    * target (older layout on disk) derives the count from its `_pk=`
    * partition dirs and writes the marker on first touch. */
  private val PkMarker = "_PK_BUCKETS"
  private[graft] def pkBucketsOf(tgtDir: java.nio.file.Path): Option[Int] = {
    val marker = tgtDir.resolve(PkMarker)
    if (Files.exists(marker)) Some(Files.readString(marker).trim.toInt)
    else if (Files.exists(tgtDir)) {
      val listing = Files.list(tgtDir)
      val maxPk =
        try listing.toArray(new Array[java.nio.file.Path](_))
          .map(_.getFileName.toString).collect {
            case n if n.startsWith("_pk=") => n.stripPrefix("_pk=").toInt
          }
        finally listing.close()
      // derivation only sees buckets that HOLD rows, so a small/skewed
      // legacy target whose TOP buckets are empty would under-derive —
      // and if the session conf happened to equal that wrong value the
      // require below would pass and the merge would re-key with the
      // wrong modulus (ADVICE r15). Round up to the next power of two
      // (the knob's natural values): a populated-gap derivation then
      // lands back on the true pow2 layout, and a genuinely non-pow2
      // legacy layout fails the require LOUDLY instead of silently
      // re-keying.
      if (maxPk.isEmpty) None
      else Some(java.lang.Integer.highestOneBit(
        math.max(1, 2 * maxPk.max + 1)))
    } else None
  }

  private[graft] def upsertBatch(incoming: DataFrame, tgtDir: java.nio.file.Path,
      batchId: Long): Unit = {
    if (incoming.isEmpty) return // an empty trigger must not touch the target
    val ss = incoming.sparkSession
    val confBuckets = graft.Knobs.upsertPkBuckets(incoming.sparkSession)
    val resident = pkBucketsOf(tgtDir)
    resident.foreach { n =>
      require(n == confBuckets,
        s"upsert target $tgtDir was laid out with _pk buckets=$n but " +
          s"${graft.Knobs.UpsertPkBucketsKey}=$confBuckets — the bucket count is " +
          "fixed for the life of a target; retune only for NEW targets " +
          "(or rewrite this one)")
    }
    val pkBuckets = resident.getOrElse(confBuckets)
    val withPk = incoming
      .withColumn("_batch", lit(batchId))
      .withColumn("_pk", pmod(col("event_id"), lit(pkBuckets)).cast("int"))
    if (!Files.exists(tgtDir)) {
      withPk.write.mode(SaveMode.Overwrite).partitionBy("_pk").parquet(tgtDir.toString)
      Files.writeString(tgtDir.resolve(PkMarker), pkBuckets.toString)
    } else {
      if (resident.exists(_ => !Files.exists(tgtDir.resolve(PkMarker))))
        Files.writeString(tgtDir.resolve(PkMarker), pkBuckets.toString)
      // touched bucket ids: bounded by PK_BUCKETS, safe to collect
      val touched = withPk.select(col("_pk")).distinct().collect().map(_.getInt(0)).toSeq
      val existing = ss.read.parquet(tgtDir.toString)
        .filter(col("_pk").isin(touched: _*)) // partition pruning on _pk
      val w = Window.partitionBy(col("event_id")).orderBy(col("_batch").desc)
      val merged = existing.unionByName(withPk)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      // INVARIANT: this write MUST stay dynamic-partition-overwrite. The
      // job reads tgtDir and overwrites the same path; dynamic mode defers
      // deletion of replaced partitions to job commit, after the read is
      // done. Static overwrite (or dropping the option) would delete input
      // files mid-read. Guarded by the byte-identical-partition unit test.
      merged.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_pk").parquet(tgtDir.toString)
    }
  }

  /** One-time staging of the upsert-sink input feed: batch 1 = the raw
    * events, batch 2 = corrected duplicates (value × 2 for every 5th id),
    * named so the file stream replays them in order, one per trigger.
    * Idempotent (marker files) so repeat runs — and the bench — time the
    * stream + merge, not this fixture write. */
  private[graft] def stageUpsertInput(s: SparkSession, dir: String): java.nio.file.Path = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tag = graft.Tables.pathTag(dir)
    val inDir = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_stream_${ProcessHandle.current().pid()}", s"in_$tag")
    if (!Files.exists(inDir.resolve("0_batch.parquet")) ||
        !Files.exists(inDir.resolve("1_batch.parquet"))) {
      org.apache.commons.io.FileUtils.deleteQuietly(inDir.toFile)
      Files.createDirectories(inDir)
      val raw = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      raw.coalesce(1).write.mode(SaveMode.Overwrite).parquet(inDir.resolve("b1").toString)
      raw.filter(col("event_id") % 5 === 0)
        .withColumn("value", col("value") * 2)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(inDir.resolve("b2").toString)
      moveSinglePart(inDir.resolve("b1"), inDir.resolve("0_batch.parquet"))
      moveSinglePart(inDir.resolve("b2"), inDir.resolve("1_batch.parquet"))
      // FileStreamSource orders by modification time, not name — the moves
      // preserve the staged parts' mtimes, which can tie on coarse-grained
      // filesystems and flip batch order. Pin strictly increasing mtimes.
      Files.setLastModifiedTime(inDir.resolve("0_batch.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000000L))
      Files.setLastModifiedTime(inDir.resolve("1_batch.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(2000000L))
    }
    inDir
  }

  /** Base dir for the replays' EPHEMERAL per-run state — checkpoint dirs,
    * the dedup signature store, the upsert-sink target. Every micro-batch
    * commits an offset-log write plus per-partition state-store delta
    * files into the checkpoint dir, and that commit I/O is a fixed floor
    * under every stream_* query's timing (VERDICT r16 item 7) — scratch
    * state is shuffle-local-disk-class data (guide §5/§6), so the medium
    * is a deployment knob: `spark.graft.stream.scratchDir` (a fast local
    * SSD on a real cluster; durable shared storage for anything that must
    * survive the driver, the same lever as RoundPin's
    * spark.graft.checkpointDir). Default java.io.tmpdir. A tmpfs
    * (/dev/shm) default was MEASURED AND REJECTED in this sandbox
    * (optimization r17): stream_distinct_users read 3.6–9.5 s with state
    * on /dev/shm vs 2.4–2.8 s on /tmp — shmem writes are slower than
    * page-cached disk writes under this VM runtime, so autodetecting
    * tmpfs would have shipped a regression. */
  private[graft] def scratchBase(s: SparkSession): java.nio.file.Path = {
    val base = s.conf.getOption("spark.graft.stream.scratchDir")
      .filter(_.nonEmpty)
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val p = Paths.get(base, s"graft_scratch_${ProcessHandle.current().pid()}")
    Files.createDirectories(p)
    p
  }

  /** Shuffle-partition count for the bounded stream replays — SIZE-DERIVED
    * (optimization r16; guide §2.2 "fewer, larger reduce partitions" and
    * the scale-adaptive-settings rule): state-store instances, their
    * per-batch commits and the memory-sink collection all scale with
    * shuffle partitions, and an idle A/B at sf0.1 read the family at
    * 33.6 s (8 partitions, the old constant) / 30.3 s (4) / 27.8 s (2) /
    * 33.3 s (1 — compute serializes). One partition per 32 MB of stream
    * input, floor 2, capped at the context's parallelism: sf0.1's 2 MB
    * events file → 2; the ×100 rehearsal's ~200 MB → 7; a real deployment
    * sets `spark.graft.stream.shufflePartitions` (state must be
    * executor-memory-sized, the upsert-sink bucket rule). Results are
    * partition-count-independent (every query ends in an ORDER BY; the
    * RocksDB/default-provider parity spec re-runs the family). */
  private[graft] def streamShufflePartitions(s: SparkSession, bytes: Long): Int =
    s.conf.getOption("spark.graft.stream.shufflePartitions").map(_.toInt)
      .getOrElse {
        val byBytes = 1 + ((bytes - 1) / (32L << 20)).toInt
        math.max(2, math.min(s.sparkContext.defaultParallelism, byBytes))
      }

  /** Run a streaming aggregation to completion into a memory sink.
    * State-store instances scale with shuffle partitions; for these
    * bounded replays the size-derived narrow setting cuts per-batch
    * state-commit overhead without changing results. The narrow setting
    * lives in a CLONED session (shared SparkContext, isolated SQLConf —
    * the stream is built by `build` against that clone), so the caller's
    * session conf is never mutated and a concurrent query on it can't
    * silently inherit narrow parallelism. The memory-sink view and the
    * returned frame are bound to the clone, which is dropped with it. */
  private def runToTable(s: SparkSession, dir: String,
      build: SparkSession => DataFrame,
      name: String, mode: String): DataFrame = {
    val scoped = org.apache.spark.sql.graftbridge.Bridge.cloneSession(s)
    val nBytes = try Files.size(Paths.get(dir, "events.parquet")) catch {
      case _: Throwable => 0L
    }
    scoped.conf.set("spark.sql.shuffle.partitions",
      streamShufflePartitions(s, nBytes).toString)
    // explicit checkpoint on the scratch medium (see scratchBase) instead
    // of Spark's implicit temp dir under java.io.tmpdir; deleted with the
    // query — these bounded replays have nothing to recover
    val ckpt = Files.createTempDirectory(scratchBase(s), s"ckpt_${name}_")
    val q = build(scoped).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(mode).start()
    try { q.processAllAvailable() } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    scoped.table(name)
  }

  val queries: Map[String, QFn] = Map(
    // Streaming heavy hitters — per hourly window, the top-3 event types
    // by count (the leaderboard every streaming dashboard shows). The
    // STREAM side is the plain tumbling count through the complete-mode
    // memory sink; the top-k is a batch rank over the materialized
    // WINDOW-grain frame (|windows|·|types| rows — the rank window is
    // partitioned by window start, never global, never the fact).
    "stream_topk" -> ((s, dir) => {
      val hourly = runToTable(s, dir, s2 => eventsStream(s2, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
        "mem_topk", "complete")
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"))
      hourly.withColumn("rk", row_number().over(
          Window.partitionBy(col("w_start_s"))
            .orderBy(col("n").desc, col("event_type"))))
        .filter(col("rk") <= 3)
        .select(col("w_start_s"), col("rk").cast("int").as("rk"),
          col("event_type"), col("n"))
        .orderBy(col("w_start_s"), col("rk"))
    }),

    "stream_tumbling" -> ((s, dir) => {
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v")),
        "mem_tumbling", "complete")
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"), col("v"))
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    // Streaming histogram quantiles — per tumbling hour, p50/p95 as
    // fixed-bin histogram edges (50 × width-10 bins over the value
    // domain): the bounded-state way to serve latency/value percentiles
    // from a stream — exact quantiles need the window's full value
    // multiset in state, a histogram needs 50 counters per window at ANY
    // event rate. The STREAM side is the windowed bin count through the
    // complete-mode memory sink; the quantile fold is a batch rank over
    // the (window × ≤50 bins) grain, integer-exact (2·cum ≥ n and
    // 20·cum ≥ 19·n avoid float thresholds).
    "stream_hist_quantile" -> ((s, dir) => {
      val binned = runToTable(s, dir, s2 => eventsStream(s2, dir)
        .withColumn("bin", least(lit(49L), floor(col("value") / 10).cast("long")))
        .groupBy(window(col("ts"), "1 hour"), col("bin"))
        .agg(count(lit(1)).as("n")),
        "mem_histq", "complete")
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          col("bin"), col("n"))
      val wW = Window.partitionBy(col("w_start_s")).orderBy(col("bin"))
      val tot = Window.partitionBy(col("w_start_s"))
      binned
        .withColumn("cum", sum(col("n")).over(
          wW.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nt", sum(col("n")).over(tot))
        .groupBy(col("w_start_s"))
        .agg(max(col("nt")).as("n"),
          (min(when(col("cum") * 2 >= col("nt"), col("bin"))) * 10.0).as("p50_edge"),
          (min(when(col("cum") * 20 >= col("nt") * 19, col("bin"))) * 10.0).as("p95_edge"))
        .orderBy(col("w_start_s"))
    }),

    // Windowed pivot — the wide per-window metrics row every streaming
    // dashboard reads (one row per hour, one column per event type).
    // Structured Streaming rejects `.pivot` on a streaming frame, so the
    // production workaround IS the operator: conditional aggregation
    // against the known type catalog (exact integer counts per column,
    // one stateful agg — same state size as the long-format rollup but
    // no downstream reshape). Catalog changes are schema changes here,
    // which is what a dashboard contract wants anyway — the columns
    // derive from Tables.EventTypes (the generator's closed catalog), so
    // a type added there grows the row rather than silently leaking into
    // n_total only; StreamingSpec pins Σ n_<type> == n_total.
    "stream_windowed_pivot" -> ((s, dir) => {
      val perType = EventTypes.map(et =>
        sum(when(col("event_type") === et, 1L).otherwise(0L)).as(s"n_$et"))
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(perType.head, perType.tail :+ count(lit(1)).as("n_total"): _*),
        "mem_wpivot", "complete")
        .select(unix_timestamp(col("window.start")).as("w_start_s") +:
          (EventTypes.map(et => col(s"n_$et")) :+ col("n_total")): _*)
        .orderBy(col("w_start_s"))
    }),

    // Streaming rate-anomaly alert — the monitoring read every streaming
    // rollup feeds (collect windowed counts continuously, flag the
    // windows whose volume is statistically off): the STREAM side is a
    // plain hourly tumbling count (exactly-once through the same
    // complete-mode memory sink as the other windows); the ALERT side
    // is a deterministic batch read over the materialized table —
    // per-type moments from EXACT integer window counts, z per window
    // as one mirrored double tree, |z| > 2 flags. nullif guards a
    // constant series (sd = 0 → NULL z, no alert).
    "stream_rate_alert" -> ((s, dir) => {
      val hourly = runToTable(s, dir, s2 => eventsStream(s2, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
        "mem_rate_alert", "complete")
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"))
      // moments from a RENAMED projection: both sides read the same
      // memory-sink view, and an un-aliased self-join trips conflicting-
      // attribute resolution on the view's output
      val mom = hourly.select(col("event_type").as("et2"), col("n").as("n2"))
        .groupBy(col("et2"))
        .agg(count(lit(1)).as("k"), sum(col("n2")).as("sn"),
          sum(col("n2") * col("n2")).as("qn"))
      val mu = col("sn").cast("double") / col("k")
      val sd = sqrt((col("k") * col("qn") - col("sn") * col("sn"))
        .cast("double") / (col("k") * (col("k") - 1)))
      hourly.join(broadcast(mom), col("event_type") === col("et2"))
        .select(col("w_start_s"), col("event_type"), col("n"),
          round((col("n").cast("double") - mu) / nullif(sd, lit(0.0)), 6)
            .as("z"))
        .withColumn("alert", abs(col("z")) > 2.0)
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    "stream_sliding" -> ((s, dir) => {
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("v")),
        "mem_sliding", "complete")
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"), col("v"))
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    "stream_session" -> ((s, dir) => {
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events")),
        "mem_session", "complete")
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("sess_start_s"),
          unix_timestamp(col("session_window.end")).as("sess_end_s"),
          col("n_events"))
        .orderBy(col("user_id"), col("sess_start_s"))
    }),

    "stream_watermark" -> ((s, dir) => {
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n")),
        "mem_watermark", "update")
        .select(unix_timestamp(col("window.start")).as("w_start_s"),
          col("event_type"), col("n"))
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    "stream_dedup" -> ((s, dir) => {
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates("event_id")
        .select(col("event_id"), col("event_type")),
        "mem_dedup", "append")
        .orderBy(col("event_id"))
    }),

    // Exact windowed distinct users — THE streaming-distinct pattern:
    // count(DISTINCT) isn't supported in a streaming agg, so the
    // canonical plan is watermark → dropDuplicates on (window-bucket,
    // type, user) — keyed dedup state, watermark-bounded — then an
    // ordinary windowed count of the deduped stream. State is
    // hash-partitioned by the dedup key and expires with the watermark;
    // at scale this is exactly how per-window DAU/uniques run.
    // FIXTURE COUPLING: the oracle is an exact batch count(DISTINCT), but
    // dropDuplicates state is bounded by the 10-minute watermark — an
    // event arriving >10 min out of order after its dedup state expired
    // would be re-counted and silently diverge. StreamingSpec asserts the
    // events fixture's max disorder (arrival-order ts regression) stays
    // under the watermark, so a generator change that adds later data
    // trips a test instead of a silent oracle drift.
    "stream_distinct_users" -> ((s, dir) => {
      runToTable(s, dir, s2 => eventsStream(s2, dir)
        .withWatermark("ts", "10 minutes")
        .select(window(col("ts"), "5 minutes").as("w"),
          col("event_type"), col("user_id"))
        .dropDuplicates("w", "event_type", "user_id")
        .groupBy(col("w"), col("event_type"))
        .agg(count(lit(1)).as("n_users")),
        "mem_distinct_users", "complete")
        .select(unix_timestamp(col("w.start")).as("w_start_s"),
          col("event_type"), col("n_users"))
        .orderBy(col("w_start_s"), col("event_type"))
    }),

    // stream-static join: the micro-batch stream enriched against a static
    // dimension (the connector pattern: incoming feed ⋈ reference data).
    // The static side is broadcast into every micro-batch.
    "stream_static_join" -> ((s, dir) => {
      runToTable(s, dir, { s2 =>
        val dim = t(s2, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        eventsStream(s2, dir)
          .join(broadcast(dim), col("user_id") === col("c_custkey"), "inner")
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
      }, "mem_static_join", "complete")
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),

    // arbitrary keyed state via mapGroupsWithState: per-user running
    // counter + latest event type, the custom-state surface
    // (KeyValueGroupedDataset) the north star names explicitly. The fold is
    // order-insensitive (count + strict max on (ts, event_id)), so no
    // in-batch sort is needed for determinism.
    "stream_custom_state" -> ((s, dir) => {
      runToTable(s, dir, { s2 =>
        import s2.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
        val src = eventsStream(s2, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .as[(Long, Long, String, Long)]
        src.groupByKey(_._2)
          .mapGroupsWithState[(Long, String, Long, Long), (Long, Long, String)](
            GroupStateTimeout.NoTimeout) {
            case (uid, rows, state: GroupState[(Long, String, Long, Long)]) =>
              var (n, lastType, lastTs, lastId) =
                state.getOption.getOrElse((0L, "", Long.MinValue, Long.MinValue))
              rows.foreach { r =>
                n += 1
                if (r._4 > lastTs || (r._4 == lastTs && r._1 > lastId)) {
                  lastType = r._3; lastTs = r._4; lastId = r._1
                }
              }
              state.update((n, lastType, lastTs, lastId))
              (uid, n, lastType)
          }
          .toDF("user_id", "n_events", "last_type")
      // single-file source → one micro-batch → one update row per user
      }, "mem_custom_state", "update")
        .orderBy(col("user_id"))
    }),

    // stream-stream interval join: each click paired with the same user's
    // purchases within the following 5 minutes. BOTH sides are unbounded,
    // so this is the genuinely stateful join: watermarks bound how long a
    // side's rows are retained, and the time-range conjunct is what lets
    // the engine evict state — an equi-join without it would buffer both
    // streams forever. State is hash-partitioned by user_id, the same
    // shuffle a batch join would use, so it scales like the batch twin.
    "stream_stream_join" -> ((s, dir) => {
      runToTable(s, dir, { s2 =>
        val clicks = eventsStream(s2, dir)
          .filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "10 minutes")
        val purchases = eventsStream(s2, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "10 minutes")
        clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 5 MINUTES"))
          .select(col("c_id"), col("p_id"), col("c_user"),
            unix_timestamp(col("c_ts")).as("c_ts_s"))
      }, "mem_ss_join", "append")
        .orderBy(col("c_id"), col("p_id"))
    }),

    // foreachBatch upsert (the MongoDB-load analogue, README.md:24,:29):
    // two micro-batches — original events, then a corrected re-send of
    // every 5th event — merged key-wise into a parquet "collection";
    // replay is idempotent (latest batch wins per event_id).
    "stream_upsert_sink" -> ((s, dir) => {
      val inDir = stageUpsertInput(s, dir)
      val tag = graft.Tables.pathTag(dir)
      // per-run scratch collection (fresh every invocation — the replay IS
      // the query); a durable deployment target comes via scratchDir conf
      val tgtDir = scratchBase(s).resolve(s"tgt_$tag")
      org.apache.commons.io.FileUtils.deleteQuietly(tgtDir.toFile)
      val stream = s.readStream
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType), StructField("value", DoubleType))))
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(inDir.toString)
      val ckpt = Files.createTempDirectory(scratchBase(s), "ckpt_upsert_")
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          upsertBatch(batch, tgtDir, batchId)
        }
        .start()
      try { q.processAllAvailable() } finally {
        q.stop()
        org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
      }
      s.read.parquet(tgtDir.toString)
        .select(col("event_id"), col("event_type"), round(col("value"), 6).as("value"))
        .orderBy(col("event_id"))
    }))

  // the streams replay a bounded file source to completion, so their
  // results are deterministic relational functions of `events` — each gets
  // a direct DuckDB oracle (the win_*_batch twins pin the same shapes).
  private val sessionized =
    """(SELECT user_id, us,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       FROM (
         SELECT user_id, event_id, epoch_us(ts) AS us,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
                THEN 1
                WHEN lag(epoch_us(ts), 1)
                  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                THEN 1 ELSE 0 END AS new_sess
         FROM events))"""

  val oracles: Map[String, String] = Map(
    "stream_topk" ->
      """WITH hourly AS (
           SELECT (epoch_us(ts) // 3600000000) * 3600 AS w_start_s,
                  event_type, count(1) AS n
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT w_start_s, event_type, n,
                  row_number() OVER (PARTITION BY w_start_s
                    ORDER BY n DESC, event_type) AS rk
           FROM hourly)
         SELECT w_start_s, CAST(rk AS INT) AS rk, event_type, n
         FROM r WHERE rk <= 3 ORDER BY w_start_s, rk""",
    "stream_tumbling" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS w_start_s, event_type,
         count(1) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
         FROM events GROUP BY 1, 2 ORDER BY w_start_s, event_type""",
    "stream_hist_quantile" ->
      """WITH b AS (
           SELECT (epoch_us(ts) // 3600000000) * 3600 AS w_start_s,
                  least(49, CAST(floor(value / 10) AS BIGINT)) AS bin,
                  count(1) AS n
           FROM events GROUP BY 1, 2),
         c AS (
           SELECT w_start_s, bin, n,
                  sum(n) OVER (PARTITION BY w_start_s ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(n) OVER (PARTITION BY w_start_s) AS nt
           FROM b)
         SELECT w_start_s, CAST(max(nt) AS BIGINT) AS n,
                min(CASE WHEN cum * 2 >= nt THEN bin END) * 10.0 AS p50_edge,
                min(CASE WHEN cum * 20 >= nt * 19 THEN bin END) * 10.0 AS p95_edge
         FROM c GROUP BY w_start_s ORDER BY w_start_s""",
    "stream_windowed_pivot" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS w_start_s,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         count(1) AS n_total
         FROM events GROUP BY 1 ORDER BY w_start_s""",
    "stream_rate_alert" ->
      """WITH hourly AS (
           SELECT (epoch_us(ts) // 3600000000) * 3600 AS w_start_s, event_type,
                  CAST(count(1) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         mom AS (
           SELECT event_type, count(1) AS k,
                  CAST(sum(n) AS BIGINT) AS sn,
                  CAST(sum(n * n) AS BIGINT) AS qn
           FROM hourly GROUP BY event_type),
         z AS (
           SELECT w_start_s, h.event_type, n,
                  round((CAST(n AS DOUBLE) - CAST(sn AS DOUBLE) / k) /
                        nullif(sqrt(CAST(k * qn - sn * sn AS DOUBLE)
                                    / (k * (k - 1))), 0.0), 6) AS z
           FROM hourly h JOIN mom m ON h.event_type = m.event_type)
         SELECT w_start_s, event_type, n, z, abs(z) > 2.0 AS alert
         FROM z ORDER BY w_start_s, event_type""",
    "stream_distinct_users" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS w_start_s, event_type,
         count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2 ORDER BY w_start_s, event_type""",
    "stream_sliding" ->
      """SELECT ((epoch_us(ts) // 300000000) - i) * 300 AS w_start_s, event_type,
         count(1) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
         FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
         GROUP BY 1, 2 ORDER BY w_start_s, event_type""",
    // session_window.end = last event ts + the 30-minute gap
    "stream_session" ->
      s"""SELECT user_id,
         min(us) // 1000000 AS sess_start_s,
         (max(us) + 1800000000) // 1000000 AS sess_end_s,
         count(1) AS n_events
         FROM $sessionized
         GROUP BY user_id, sid ORDER BY user_id, sess_start_s""",
    // single-file replay → one micro-batch → nothing is late: the update
    // stream materializes exactly the complete tumbling counts
    "stream_watermark" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS w_start_s, event_type,
         count(1) AS n
         FROM events GROUP BY 1, 2 ORDER BY w_start_s, event_type""",
    // event_id is unique in the synthetic events table, so dedup is the
    // identity projection (the duplicate-injection path is unit-tested)
    "stream_dedup" ->
      """SELECT event_id, event_type FROM events ORDER BY event_id""",
    // batch 2 re-sends every 5th id with value × 2 and wins the merge
    "stream_upsert_sink" ->
      """SELECT event_id, event_type,
         round(CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END, 6) AS value
         FROM events ORDER BY event_id""",
    "stream_static_join" ->
      """SELECT c_mktsegment, event_type, count(1) AS n,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment, event_type
         ORDER BY c_mktsegment, event_type""",
    // bounded replay ⇒ the interval join equals its batch twin exactly
    "stream_stream_join" ->
      """SELECT c.event_id AS c_id, p.event_id AS p_id,
         c.user_id AS c_user, epoch_us(c.ts) // 1000000 AS c_ts_s
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) >= epoch_us(c.ts)
          AND epoch_us(p.ts) <= epoch_us(c.ts) + 300000000
         ORDER BY c_id, p_id""",
    "stream_custom_state" ->
      """SELECT user_id, n_events, last_type FROM (
           SELECT user_id,
             count(1) OVER (PARTITION BY user_id) AS n_events,
             event_type AS last_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY user_id"""
  ).map { case (k, v) => k -> v.replaceAll("\\s+", " ").trim }
}
