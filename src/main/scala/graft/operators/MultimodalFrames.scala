package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.I multimodal frame-sampling plumbing: treat the binary payload as a
  * frame container (fixed 256-byte frames standing in for video frames /
  * audio windows), sample every 4th frame, and emit per-frame metadata —
  * the Spark-side shape (binary slicing, HOF over frame index space,
  * deterministic per-frame digest) is exactly what a real codec-backed
  * sampler produces; only the digest (md5 over the frame bytes) stands in
  * for decode. Per-frame records are serialized `idx:digest:bytes` at the
  * query boundary so the driver's pandas compare can hash the column.
  *
  * Scale note: per-row HOFs inside codegen — no shuffle; frame sampling at
  * 100 TB is embarrassingly parallel over the scan.
  */
object MultimodalFrames {

  val queries: Map[String, QFn] = Map(
    "mm_frame_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("n_frames", ceil(octet_length(col("payload")) / 256.0).cast("int"))
        .withColumn("frames", expr(
          """transform(
               filter(sequence(0, greatest(n_frames, 1) - 1), i -> i % 4 = 0 AND i < n_frames),
               i -> concat(CAST(i AS STRING), ':',
                           md5(substring(payload, i * 256 + 1, 256)), ':',
                           CAST(octet_length(substring(payload, i * 256 + 1, 256)) AS STRING)))"""))
        .select(col("doc_id"), col("n_frames"),
          size(col("frames")).as("n_sampled"),
          concat_ws(";", col("frames")).as("sampled"))
        .orderBy(col("doc_id"))
    }))

  // oracle-expressible because the corpus is ASCII (verified at all SFs):
  // DuckDB's char-level substring/strlen equal the byte-level Spark ops,
  // and md5 hex digests agree for identical bytes.
  val oracles: Map[String, String] = Map(
    "mm_frame_sample" ->
      """WITH f AS (
           SELECT doc_id, CAST(ceil(strlen(text) / 256.0) AS INTEGER) AS n_frames, text
           FROM documents),
         g AS (
           SELECT doc_id, n_frames,
             list_transform(
               list_filter(range(0, CAST(greatest(n_frames, 1) AS BIGINT)), i -> i % 4 = 0 AND i < n_frames),
               i -> CAST(i AS VARCHAR) || ':' ||
                    md5(substring(text, CAST(i AS INTEGER) * 256 + 1, 256)) || ':' ||
                    CAST(strlen(substring(text, CAST(i AS INTEGER) * 256 + 1, 256)) AS VARCHAR)) AS frames
           FROM f)
         SELECT doc_id, n_frames, len(frames) AS n_sampled, array_to_string(frames, ';') AS sampled
         FROM g ORDER BY doc_id"""
  ).map { case (k, v) => k -> v.replaceAll("\\s+", " ").trim }
}
