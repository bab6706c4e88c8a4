package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.I multimodal frame-sampling plumbing: treat the binary payload as a
  * frame container (fixed 256-byte frames standing in for video frames /
  * audio windows), sample every 4th frame, and emit per-frame metadata —
  * the Spark-side shape (binary slicing, HOF over frame index space,
  * deterministic per-frame digest) is exactly what a real codec-backed
  * sampler produces; only the digest stands in for decode.
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
        .withColumn("sampled", expr(
          """transform(
               filter(sequence(0, greatest(n_frames, 1) - 1), i -> i % 4 = 0 AND i < n_frames),
               i -> struct(i AS frame_idx,
                           crc32(substring(payload, i * 256 + 1, 256)) AS digest,
                           octet_length(substring(payload, i * 256 + 1, 256)) AS frame_bytes))"""))
        .select(col("doc_id"), col("n_frames"),
          size(col("sampled")).as("n_sampled"), col("sampled"))
        .orderBy(col("doc_id"))
    }))

  val oracles: Map[String, String] = Map.empty
}
