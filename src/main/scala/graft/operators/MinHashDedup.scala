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
  * groupBy — never an all-pairs cross join. Since round 16 only one
  * REPRESENTATIVE per distinct lower(text) is banded (exact copies
  * collide in every band at any r — per-doc banding was quadratic in
  * copy-factor; ×100 rehearsal: 107.9M band-join rows → 836) and
  * membership re-expands relationally. This is the unbounded-scale
  * path: cost is O(distinct docs × tokens) + bucket-local pair
  * expansion + member-count-bounded re-expansion.
  *
  * SimHash: 16-bit signature from per-bit majority vote over token hashes;
  * hamming-adjacent buckets give the candidate set.
  *
  * Both are deterministic (fixed seeds, total-order tie-breaks) but carry
  * no DuckDB oracle (xxhash64 has no DuckDB equivalent); the unit suite
  * plants perturbed near-duplicates and asserts they collide.
  */
object MinHashDedup {

  private val K = 16      // default minhash signature length (4 bands × 4)
  private val BANDS = 4   // band count is fixed; rows-per-band adapts

  /** Corpus-adaptive rows-per-band (VERDICT r14 item 2 — the 4×4 banding
    * was the last fixed constant of the LSH-planes class): smallest
    * r ∈ [4, 16] with occ·4^r ≥ n. An unrelated pair collides in a band
    * with probability ≈ J_bg^r (J_bg = background Jaccard), so holding
    * occ·4^r ≥ n keeps expected background candidate volume ~linear in
    * the corpus where a fixed r makes it quadratic. Signature K = 4·r;
    * r = 4 (K = 16, bit-identical to the historical signatures and every
    * fixture pin) through occ·256 = 65 536 docs — all fixture, bench and
    * ×10 rehearsal scales — then +1 row per 4× corpus. Capped at r = 16:
    * past occ·4^16 the S-curve threshold saturates and the documented
    * scale path is wider shingles, like the 30-plane LSH cap. Pure
    * integer rule; exact duplicates collide at ANY r. */
  private[graft] def bandRows(n: Long,
      occ: Long = graft.Knobs.MinhashTargetOccupancyDefault): Int =
    (4 to 16).find(r => (occ << (2 * r)) >= n).getOrElse(16)

  /** Corpus-adaptive bucket width for dedup_simhash's published bucket:
    * smallest b ∈ [8, 16] bits with occ·2^b ≥ n (top b bits of the
    * 16-bit signature); 8 bits — the historical `/256` bucket — through
    * occ·256 = 8 192 docs, capped at the signature width (past
    * occ·2^16 docs the 16-bit signature itself saturates; the scale
    * path is a wider signature, documented like the LSH plane cap). */
  private[graft] def simhashBucketBits(n: Long,
      occ: Long = graft.Knobs.SimhashTargetOccupancyDefault): Int =
    (8 to 16).find(b => (occ << b) >= n).getOrElse(16)

  /** doc_id + k-column minhash signature for an (id, tokens) projection.
    * One fused codegen pass (functions/MinHashSig): each token hashed ONCE,
    * all k minima updated per element — replacing the k separate
    * interpreted `aggregate` HOFs that re-traversed the array 16× per row
    * (the round-3 19 s text_dedup_near hot spot). `shingleWidth` > 1
    * hash-combines width-token windows in the same pass, so shingles never
    * materialize as strings. width=1 signatures are bit-identical to the
    * old SQL formulation; signature m_j is independent of k (seeded per
    * j), so a longer signature EXTENDS the historical prefix exactly like
    * the adaptive LSH plane matrix. `k` defaults to the compiled K = 16;
    * batch callers pass 4·bandRows(n). NOTE: stream_dedup_near's
    * signature STORE is a persisted layout — like the upsert sink's
    * `_PK_BUCKETS`, its k is fixed at store creation (the compiled
    * default), not corpus-adaptive mid-stream. */
  def signatures(docs: DataFrame, idCol: String, toksCol: String,
                 shingleWidth: Int = 1, seed: Long = 42L, k: Int = K): DataFrame = {
    val sigged = docs.withColumn("_sig",
      graft.functions.MinHashSig.minhash_sig(col(toksCol), k, shingleWidth, seed))
    sigged.select(col(idCol) +: (0 until k).map(j => col("_sig").getItem(j).as(s"m$j")): _*)
  }

  /** (band_idx, band_hash) per doc: rows-per-band hashes hashed together;
    * always [[BANDS]] bands, k/BANDS rows each. */
  def banded(sig: DataFrame, idCol: String, k: Int = K): DataFrame = {
    val bands = (0 until BANDS).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64((0 until k / BANDS).map(i => col(s"m${b * (k / BANDS) + i}")): _*).as("bh"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_idx").as("band_idx"), col("band.bh").as("bh"))
  }

  val queries: Map[String, QFn] = Map[String, QFn](
    // The exact-dup collapse published as its own operator (round 16 —
    // the building block every LSH pair family now shares): each doc's
    // cluster representative (min doc_id over identical lower(text)) and
    // cluster size. At 100 TB this frame IS the dedup ledger: band reps,
    // re-expand members, weight by cluster_size. One window shuffle on
    // the exact key — fully oracle-able (no sketch involved).
    "dedup_rep_collapse" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lower(col("text")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          min(col("doc_id")).over(w).as("rep"),
          count(lit(1)).over(w).as("cluster_size"))
        .orderBy(col("doc_id"))
    }),

    // Duplication profile of the corpus — the curation report read
    // before choosing a dedup strategy (a crawl with 1e6-copy boilerplate
    // clusters needs the collapse; a clean corpus doesn't): cluster-size
    // histogram over exact keys with each size's share of documents.
    // Two aggregations on the cluster grain; the share divides two exact
    // longs once, 6-dp-gridded.
    "corpus_dup_profile" -> ((s, dir) => {
      val sizes = t(s, dir, "documents")
        .groupBy(lower(col("text")).as("lt")).agg(count(lit(1)).as("c"))
      // histogram persisted (cluster-size grain, tiny), total via a 1-row
      // agg broadcast — NOT a global window: an un-partitioned window
      // would single-partition the frame, and cluster-size cardinality,
      // while small in practice, is not formally bounded (lint r16)
      val hist = persistShared("cdp_hist", sizes
        .groupBy(col("c").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("c")).as("n_docs")))
      hist.crossJoin(broadcast(hist.agg(sum(col("n_docs")).as("tot"))))
        .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
          round(col("n_docs").cast("double") / col("tot"), 6).as("doc_share"))
        .orderBy(col("cluster_size"))
    }),

    // 3-shingle MinHash-LSH near-duplicate candidate pairs, ranked by band
    // agreement. Shingling (vs raw token sets) keeps band buckets sparse —
    // on this corpus token-set banding produces 2500-doc buckets (≈3M pairs
    // from one bucket) while shingle buckets stay ≤4 docs, so the bucket
    // self-join is tiny at any scale. Shingles are hash-combined inside the
    // fused MinHashSig pass (shingleWidth = 3) — never built as strings.
    // BEHAVIOR CHANGE (round 4, the MinHashSig rewrite): shingles are now
    // hash-combined over LOWERED tokens, and a doc shorter than the width
    // contributes one partial-window shingle — previously shingles were
    // string-concatenated and short docs fell back to the raw
    // case-preserving text. Candidate pairs can differ from the round-3
    // output; both are valid LSH parameterizations. Since xxhash64 has no
    // DuckDB twin (no SQL oracle possible), the sf0.001 candidate-pair set
    // is pinned verbatim by OperatorSpec's fixture regression test.
    // EXACT-DUPLICATE COLLAPSE (VERDICT r15 item 1 — the one named
    // scale-killer): docs sharing lower(text) have IDENTICAL signatures,
    // so they collide in every band at any r — banding them individually
    // makes the bucket self-join quadratic in cluster size, and real
    // 100 TB crawls carry boilerplate clusters of 1e5–1e6 verbatim
    // copies (1e10–1e12 pairs from a single bucket). Instead: collapse
    // to one representative (min doc_id) per exact key, band
    // REPRESENTATIVES only (pair work ~linear in distinct content), and
    // re-expand membership relationally after the near-dup decision.
    // The published top-100 is recovered EXACTLY from bounded frames:
    //  - within an exact cluster every pair agrees on all BANDS bands;
    //    ordered by (d1, d2), any pair past the 101 smallest members has
    //    ≥ 101 same-rank predecessors, so rank ≤ 101 members and the 100
    //    smallest-rep clusters suffice for any global top-100;
    //  - across clusters n_bands(m1, m2) = n_bands(rep1, rep2)
    //    (identical signatures member-by-member), the lex-smallest
    //    member pair of a cluster pair IS (rep1, rep2) (reps are cluster
    //    minima), so the top-100 rep pairs by (n_bands desc, r1, r2)
    //    contain every cluster pair that can reach the global top-100,
    //    and within one cluster pair any member pair beyond either
    //    side's rank 101 has ≥ 101 same-n_bands predecessors.
    // Duplicate-free corpora (every fixture/bench scale) take the
    // degenerate path — every cluster is a singleton — and the output
    // is bit-identical to the pre-collapse formulation (the sf0.001 pin
    // and the 5-seed recall property are unchanged).
    "text_dedup_near" -> ((s, dir) => textDedupNearFrame(s, dir))) ++ moreQueries

  /** text_dedup_near body — factored out so the spec can compare the
    * collapse gate's two branches directly. Gate OFF (duplicate-free
    * corpus, [[graft.Tables.docCollapseGate]]): the pre-collapse direct
    * formulation — band every doc, bucket self-join, top-100; every
    * cluster is a singleton so the rep machinery below is the identity
    * and its window/persist/re-expansion cost buys nothing
    * (optimization r16). Gate ON: the representative collapse with
    * relational re-expansion, per the proof in the comment above. */
  private[graft] def textDedupNearFrame(s: SparkSession, dir: String): DataFrame = {
      val k = BANDS * bandRows(graft.Tables.distinctDocCount(s, dir),
        graft.Knobs.minhashTargetOccupancy(s))
      if (!graft.Tables.docCollapseGate(s, dir)) {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        val sig = signatures(docs, "doc_id", "toks", shingleWidth = 3, k = k)
        val b = RoundPin.pin(banded(sig, "doc_id", k = k))
        return b.select(col("doc_id").as("d1"), col("band_idx"), col("bh"))
          .join(b.select(col("doc_id").as("d2"), col("band_idx"), col("bh")),
            Seq("band_idx", "bh"))
          .filter(col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_bands"))
          .orderBy(col("n_bands").desc, col("d1"), col("d2"))
          .limit(100)
      }
      val keyed = t(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("lt"))
        .withColumn("ekey", sha2(col("lt"), 256))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ekey")).orderBy(col("doc_id"))
      // one shuffle by exact key; text kept only on rank-1 rows (the
      // representatives), ranks capped at 101 (sufficient for any
      // top-100 — see proof above)
      val members = persistShared("tdn_members", keyed
        .withColumn("mrank", row_number().over(w))
        .filter(col("mrank") <= 101)
        .select(col("doc_id"), col("ekey"), col("mrank"),
          when(col("mrank") === 1, col("lt")).as("lt")))
      val reps = members.filter(col("mrank") === 1)
        .select(col("doc_id"), col("ekey"), split(col("lt"), " ").as("toks"))
      val sig = signatures(reps, "doc_id", "toks", shingleWidth = 3, k = k)
      // pin the banded frame: both self-join sides otherwise re-execute
      // the signature chain through the members cache (lint r16 — the
      // frame is rep-grain × bands, bounded by distinct content)
      val b = RoundPin.pin(banded(sig, "doc_id", k = k))
      val a1 = b.select(col("doc_id").as("r1"), col("band_idx"), col("bh"))
      val a2 = b.select(col("doc_id").as("r2"), col("band_idx"), col("bh"))
      val repPairs = a1.join(a2, Seq("band_idx", "bh"))
        .filter(col("r1") < col("r2"))
        .groupBy(col("r1"), col("r2")).agg(count(lit(1)).as("n_bands"))
        .orderBy(col("n_bands").desc, col("r1"), col("r2"))
        .limit(100)
      // cross-cluster expansion: members of the two clusters behind each
      // surviving rep pair (≤ 100 · 101 · 101 rows, constant-bounded)
      // pinned: read three times below (two cross joins + dupTop) — each
      // use would otherwise replay the members cache (lint r16)
      val repKey = RoundPin.pin(members.filter(col("mrank") === 1)
        .select(col("doc_id").as("rep"), col("ekey")))
      val m1 = members.select(col("ekey").as("k1"), col("doc_id").as("ma"))
      val m2 = members.select(col("ekey").as("k2"), col("doc_id").as("mb"))
      val cross = broadcast(repPairs
          .join(repKey.select(col("rep").as("r1"), col("ekey").as("k1")), "r1")
          .join(repKey.select(col("rep").as("r2"), col("ekey").as("k2")), "r2"))
        .join(m1, "k1").join(m2, "k2")
        .select(least(col("ma"), col("mb")).as("d1"),
          greatest(col("ma"), col("mb")).as("d2"), col("n_bands"))
      // within-cluster expansion: every pair in an exact cluster agrees
      // on all bands; the 100 smallest-rep multi-member clusters bound it
      val dupTop = broadcast(members.filter(col("mrank") === 2)
        .select(col("ekey")).join(repKey, "ekey")
        .orderBy(col("rep")).limit(100).select(col("ekey")))
      val within = dupTop
        .join(members.select(col("ekey"), col("doc_id").as("d1"),
          col("mrank").as("ra")), "ekey")
        .join(members.select(col("ekey"), col("doc_id").as("d2"),
          col("mrank").as("rb")), "ekey")
        .filter(col("ra") < col("rb"))
        .select(col("d1"), col("d2"), lit(BANDS.toLong).as("n_bands"))
      cross.unionAll(within)
        .orderBy(col("n_bands").desc, col("d1"), col("d2"))
        .limit(100)
  }

  private def moreQueries: Map[String, QFn] = Map(
    // Recall audit of the MinHash-LSH candidate generator — the dedup
    // family's analogue of vec_ann_recall (an index you never grade is
    // an index you can't trust): exact 3-gram-shingle Jaccard ≥ 0.5
    // pairs on the bounded probe window (doc_id < 256, the pairStats
    // window discipline) form the ground truth; the LSH banded buckets
    // (same signatures as text_dedup_near) propose candidates; recall =
    // |cand ∩ truth| / |truth|. At scale only the ground-truth side is
    // window-bounded — the LSH side is the production path being graded.
    // No DuckDB oracle (xxhash64 signatures); the sf0.001 output row is
    // pinned by the unit suite like the other no-oracle sketches.
    "dedup_minhash_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 256)
        .withColumn("toks", split(lower(col("text")), " "))
      // exact shingle-set Jaccard ground truth on the bounded window
      val sh = persistShared("mh_recall_sh", docs
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, greatest(1, size(toks) - 2)), " +
            "i -> concat_ws(' ', slice(toks, i, 3)))"))).as("g")))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
      // truth and cand are tiny pair lists each consumed twice (own count
      // + the hit join) — materialized eagerly so the composed 1-row plan
      // replays no cached relation (the etl_referential_check lesson,
      // caught by the InMemoryTableScan>8 lint at x12)
      val truth = sh.as("a")
        .join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("d1"), col("nt").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("nt").as("n2")), "d2")
        .filter(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")) >= 0.5)
        .select(col("d1"), col("d2"))
        .transform(RoundPin.pin)
      // LSH candidates from the SAME banded signatures as text_dedup_near
      // (including its corpus-derived rows-per-band — the production path
      // being graded is the one the production parameters produce);
      // banded feeds BOTH sides of the bucket join — persisted so the
      // documents scan runs once for it (r10 scan lint caught the 4×)
      val k = BANDS * bandRows(graft.Tables.distinctDocCount(s, dir),
        graft.Knobs.minhashTargetOccupancy(s))
      val sig = signatures(docs, "doc_id", "toks", shingleWidth = 3, k = k)
      val b = persistShared("mh_recall_bands", banded(sig, "doc_id", k = k))
      val cand = b.select(col("doc_id").as("d1"), col("band_idx"), col("bh"))
        .join(b.select(col("doc_id").as("d2"), col("band_idx"), col("bh")),
          Seq("band_idx", "bh"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2")).distinct()
        .transform(RoundPin.pin)
      val hit = truth.join(cand, Seq("d1", "d2"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_truth"), col("n_candidates"), col("n_hit"),
          round(col("n_hit").cast("double") /
            nullif(col("n_truth"), lit(0L)), 6).as("recall"))
    }),

    // 16-bit SimHash signature + corpus-adaptive top-bits bucket per
    // document (simhashBucketBits: 8 bits — the historical /256 — at every
    // fixture/bench scale, widening with the corpus).
    "dedup_simhash" -> ((s, dir) => {
      val bits = simhashBucketBits(graft.Tables.docCount(s, dir),
        graft.Knobs.simhashTargetOccupancy(s))
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
          (simhash / (1L << (16 - bits))).cast("long").as("bucket"))
        .orderBy(col("doc_id"))
    }))

  val oracles: Map[String, String] = Map(
    "dedup_rep_collapse" ->
      """SELECT doc_id,
                min(doc_id) OVER (PARTITION BY lower(text)) AS rep,
                count(*) OVER (PARTITION BY lower(text)) AS cluster_size
         FROM documents ORDER BY doc_id""",
    "corpus_dup_profile" ->
      """WITH sizes AS (
           SELECT lower(text) AS lt, count(*) AS c FROM documents GROUP BY 1),
         hist AS (
           SELECT c AS cluster_size, count(*) AS n_clusters,
                  CAST(sum(c) AS BIGINT) AS n_docs
           FROM sizes GROUP BY 1)
         SELECT cluster_size, n_clusters, n_docs,
                round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_share
         FROM hist ORDER BY cluster_size""")
}
