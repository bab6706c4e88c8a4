package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.I multimodal pipeline plumbing (BASELINE.json north star
  * "multimodal columns").
  *
  * Media decode / feature extraction in a real deployment runs as a
  * vectorized batch UDF over opaque binary columns (image/audio/video
  * bytes) with typed metadata alongside. The decode libraries are not in
  * this container, so `fakeDecode` below is a clearly-marked deterministic
  * STUB — but everything Spark-side is real and load-bearing: the binary
  * column flows through the scan, the work runs as `mapPartitions` on the
  * executors (one JVM-side batch per partition, the same batch shape
  * `mapInPandas`/Arrow would see), the output schema is a typed struct, and
  * partitioning is preserved so a downstream groupBy can co-locate.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaFeat(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      checksum: Long, histo: Array[Long])

  /** STUB decode: deterministic pseudo-features from the raw bytes.
    * A real pipeline would replace the body with an image/audio decoder
    * over the same signature (bytes in → typed features out). */
  def fakeDecode(m: MediaIn): MediaFeat = {
    val bs = m.payload
    var checksum = 0L
    val histo = new Array[Long](16)
    var i = 0
    while (i < bs.length) {
      checksum = (checksum * 131 + (bs(i) & 0xff)) % 1000000007L
      histo((bs(i) & 0xff) % 16) += 1
      i += 1
    }
    MediaFeat(m.doc_id, bs.length, 64 + (checksum % 512).toInt,
      64 + ((checksum >> 9) % 512).toInt, checksum, histo)
  }

  case class Thumb(doc_id: Long, n_bytes: Int, thumb: Array[Int])

  /** STUB resize: block-mean downsample of the payload bytes to a fixed
    * 32-cell "thumbnail" — the deterministic stand-in for an image resize
    * kernel (bytes in → smaller bytes out), over the same executor-batch
    * plumbing as [[fakeDecode]]. Cell j averages bytes [j·n/32, (j+1)·n/32). */
  def fakeResize(m: MediaIn): Thumb = {
    val bs = m.payload; val n = bs.length; val w = 32
    val out = new Array[Int](w)
    var j = 0
    while (j < w) {
      val lo = (j.toLong * n / w).toInt
      val hi = ((j + 1).toLong * n / w).toInt
      var s = 0L; var i = lo
      while (i < hi) { s += (bs(i) & 0xff); i += 1 }
      out(j) = if (hi > lo) (s / (hi - lo)).toInt else 0
      j += 1
    }
    Thumb(m.doc_id, n, out)
  }

  val queries: Map[String, QFn] = Map(
    // binary payload → per-partition batch "resize" (block-mean
    // downsample) → fixed-width thumbnail: the remaining media transform
    // of the north star's decode / feature-extract / RESIZE / frame-sample
    // family, same real Spark plumbing as mm_decode_stub (binary column
    // through the scan, executor-side batches, typed output, partitioning
    // preserved), same clearly-marked deterministic kernel stand-in.
    "mm_resize_stub" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaIn]
      media.mapPartitions(_.map(fakeResize))
        .toDF()
        .withColumn("thumb", expr("array_join(transform(thumb, x -> CAST(x AS STRING)), ',')"))
        .orderBy(col("doc_id"))
    }),

    // binary payload → per-partition batch "decode" → typed features.
    // The histogram is serialized at the query boundary (driver's pandas
    // compare cannot hash array cells); the typed form stays unit-tested.
    "mm_decode_stub" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaIn]
      media.mapPartitions(_.map(fakeDecode))
        .toDF()
        .withColumn("histo", expr("array_join(transform(histo, x -> CAST(x AS STRING)), ',')"))
        .orderBy(col("doc_id"))
    }))

  // the stub decode is pure integer arithmetic over the payload bytes, so
  // it is oracle-expressible: the corpus is ASCII (verified at all SFs),
  // so DuckDB's per-char ord() equals the UTF-8 byte the Scala side folds.
  val oracles: Map[String, String] = Map(
    // block bounds and the floor division mirror fakeResize exactly;
    // empty blocks (n < 32) coalesce to 0 on both engines
    "mm_resize_stub" ->
      """WITH b AS (
           SELECT doc_id, strlen(text) AS n_bytes,
             list_transform(range(1, strlen(text) + 1), i -> CAST(ord(text[i]) AS BIGINT)) AS bytes
           FROM documents)
         SELECT doc_id, n_bytes,
           array_to_string(list_transform(range(0, 32), j ->
             coalesce(CAST(FLOOR(
               list_aggregate(bytes[CAST(j * n_bytes // 32 AS INTEGER) + 1 :
                                    CAST((j + 1) * n_bytes // 32 AS INTEGER)], 'sum')
               / GREATEST((j + 1) * n_bytes // 32 - j * n_bytes // 32, 1)) AS INTEGER), 0)), ',') AS thumb
         FROM b ORDER BY doc_id""",
    "mm_decode_stub" ->
      """WITH b AS (
           SELECT doc_id, strlen(text) AS n_bytes,
             list_transform(range(1, strlen(text) + 1), i -> CAST(ord(text[i]) AS BIGINT)) AS bytes
           FROM documents),
         c AS (
           SELECT doc_id, n_bytes, bytes,
             list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
                         (acc, v) -> (acc * 131 + v) % 1000000007) AS checksum
           FROM b)
         SELECT doc_id, n_bytes,
           CAST(64 + checksum % 512 AS INTEGER) AS width,
           CAST(64 + (checksum >> 9) % 512 AS INTEGER) AS height,
           checksum,
           array_to_string(list_transform(range(0, 16), k -> len(list_filter(bytes, x -> x % 16 = k))), ',') AS histo
         FROM c ORDER BY doc_id"""
  ).map { case (k, v) => k -> v.replaceAll("\\s+", " ").trim }
}
