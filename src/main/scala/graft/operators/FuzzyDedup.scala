package graft.operators

import graft.functions.HashFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Near-duplicate detection for document corpora (SURVEY.md §2.11;
  * BASELINE.json north-star). Three families:
  *
  *  1. MinHash + LSH banding — the 100 TB path. Cost is
  *     O(rows · shingles) for signatures plus one shuffle on
  *     (band, signature); candidate verification touches only
  *     colliding pairs. No O(n²) stage anywhere.
  *  2. Exact n-gram Jaccard — all-pairs ground truth, for oracle
  *     verification and small blocked subsets.
  *  3. SimHash — a 64-bit per-doc sketch; near-dups differ in few
  *     bits, found by chunk-blocked Hamming join.
  *
  * All hashing is md5-derived ([[graft.functions.HashFunctions]]) so
  * every stage is bit-reproducible by the DuckDB oracle: the LSH
  * candidate set itself is deterministic, not just the verified
  * output.
  *
  * Skew note (scale): a degenerate band signature shared by a huge
  * cluster makes the candidate join quadratic in that bucket. Callers
  * deduplicating adversarial corpora should cap bucket size
  * (`maxBucket`) — dropped buckets are *already duplicates by
  * signature*, better handled by exact-key grouping.
  */
object FuzzyDedup {

  /** (doc_id, sh) with empty-shingle docs removed. */
  def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact Jaccard over distinct shingle sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** MinHash signatures by explode + groupBy-min rather than the
    * per-row higher-order `transform`/`array_min` chain: HOFs are
    * interpreted per element, while the exploded projection (one md5
    * + k affine permutations) and the min-aggregate are whole-stage-
    * codegen'd with map-side partial aggregation — same values, an
    * order of magnitude faster, one shuffle keyed on doc_id. */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame =
    sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("h", baseHash30(col("s")))
      .select(col("doc_id") +: (0 until k).map(i => affine(col("h"), i).as(s"mh$i")): _*)
      .groupBy("doc_id")
      .agg(min(col("mh0")).as("mh0"),
        (1 until k).map(i => min(col(s"mh$i")).as(s"mh$i")): _*)

  /** MinHash-LSH candidate pairs: docs sharing at least one of
    * `bands` band signatures (r = k/bands minhashes concatenated).
    * Deterministic: same (k, bands, data) ⇒ same candidates. */
  def lshCandidates(sh: DataFrame, k: Int = 12, bands: Int = 4,
                    maxBucket: Option[Int] = None): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    val sig = minhashSignatures(sh, k)
    val bandRows = sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until r).map(i => col(s"mh${b * r + i}").cast("string")): _*).as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
    val capped = maxBucket match {
      case None => bandRows
      case Some(cap) =>
        // cap pathological buckets: members beyond `cap` per (band,sig)
        // are exact-signature duplicates, cheaper to handle by grouping
        bandRows.withColumn("_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")))
          .filter(col("_n") <= cap).drop("_n")
    }
    // persisted: both sides of the self-join consume this — without it
    // the signature aggregation (the expensive md5 pass) runs twice
    val cached = capped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = cached.as("a")
    val b = cached.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, verified by exact Jaccard ≥
    * `threshold` on the candidate set. The standard
    * shingle→minhash→band→bucket-join→verify pipeline. */
  def minhashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", n: Int = 3, k: Int = 12,
                      bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    // persisted: the shingle table feeds three plan branches (both
    // sides of the candidate self-join via signatures, and both sides
    // of the verification join) — without it Spark re-tokenizes and
    // re-shingles the corpus once per branch. At cluster scale this
    // is the natural checkpoint/table boundary of the pipeline.
    val sh = shingled(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidates(sh, k, bands)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("_inter", inter)
      .withColumn("jaccard",
        col("_inter") / (size(col("sh_a")) + size(col("sh_b")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold within an optional
    * blocking predicate — O(n²): ground-truth/small-corpus tool, not
    * the scale path (that's [[minhashNearDups]]). */
  def exactJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 3,
                        threshold: Double = 0.3,
                        blockFilter: Column = lit(true)): DataFrame = {
    val sh = shingled(docs.filter(blockFilter), idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("_inter", inter)
      .withColumn("jaccard",
        col("_inter") / (size(col("sh_a")) + size(col("sh_b")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Content-defined window fingerprints (winnowing-style, the
    * rolling-hash fingerprint family): hash every `w`-char window of
    * the normalized text, keep the windows whose hash ≡ 0 (mod
    * `keepMod`) — a content-defined ~1/keepMod sample that is
    * position-shift-invariant, so shared runs of text yield shared
    * fingerprints regardless of where they sit in the document.
    *
    * Windows are hashed with md5 (cross-engine determinism) rather
    * than an actual rolling update; the selection semantics are
    * identical, and a codegen'd Rabin-Karp `Expression` is the
    * drop-in upgrade if window hashing ever dominates a profile.
    *
    * Returns (doc_id, fp) rows — the exploded shape feeds the same
    * groupBy-key candidate generation as LSH banding. */
  def windowFingerprints(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", w: Int = 8,
                         keepMod: Int = 64): DataFrame = {
    val norm = graft.functions.TextFunctions.normalized(col(textCol))
    // persisted barrier: `t` must be a plain attribute when captured
    // by the window lambda below — inlined, the normalization regex
    // would re-run per window (the HOF capture trap), and an exploded
    // (doc, pos) formulation would instead ship the full text once
    // per window (~|text|² bytes through the projection)
    val nrm = docs
      .select(col(idCol).as("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val windows = transform(
      sequence(lit(1), length(col("t")) - (w - 1)),
      pos => col("t").substr(pos, lit(w)))
    nrm
      .select(col("doc_id"), explode(windows).as("win"))
      .select(col("doc_id"), md5Long(col("win")).as("wh"))
      .filter(col("wh") % keepMod === 0)
      .select(col("doc_id"), col("wh").as("fp"))
      .distinct()
  }

  /** Near-dup candidates by shared window fingerprints: pairs of docs
    * sharing ≥ `minShared` selected fingerprints. Same
    * bucket-join shape as LSH banding — no pairwise stage over the
    * corpus, only over docs sharing a fingerprint. */
  def fingerprintPairs(docs: DataFrame, minShared: Int = 10,
                       idCol: String = "doc_id", textCol: String = "text",
                       w: Int = 8, keepMod: Int = 64): DataFrame = {
    val fps = windowFingerprints(docs, idCol, textCol, w, keepMod)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** 60-bit SimHash per document over distinct tokens: bit j is set
    * iff more token-hashes have bit j set than clear. Pure
    * shuffle-agg (rows × 60 bit-rows), no pairwise stage. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col(textCol)))).as("t"))
      .withColumn("hv", md5Long(col("t")))
    tok
      .select(col("doc_id"), col("hv"), explode(sequence(lit(0), lit(59))).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(when(expr("shiftright(hv, j) & 1") === 1, 1).otherwise(-1)).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, j)")).otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs: block on any shared 15-bit chunk (4
    * chunks ⇒ any pair within Hamming distance 3 shares ≥1 chunk by
    * pigeonhole), verify `bit_count(xor) ≤ maxHamming`. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val shh = simhash(docs, idCol, textCol)
    val chunked = shh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          expr(s"shiftright(simhash, ${c * 15}) & 32767").as("ck"))): _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.ck"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
