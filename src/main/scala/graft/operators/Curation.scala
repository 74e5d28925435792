package graft.operators

import graft.functions.HashFunctions.md5Long
import graft.functions.TextFunctions.{StopEn, stopwordCount, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus curation operators that COMPOSE the engine's dedup
  * / sampling / LM-scoring primitives into the selection stages a
  * large-scale pipeline actually runs (LLM-pipeline extension,
  * SURVEY.md §2.11; the reference ETL has no corpus tooling).
  *
  * Everything here follows the repo's determinism contract: hash
  * decisions ride md5 (cross-engine bit-identical), FP read-outs are
  * rounded, orderings carry explicit tiebreaks — so every operator is
  * replayable by the DuckDB oracle and by re-runs on other cluster
  * sizes.
  */
object Curation {

  /** Leakage-safe train/val split: assignment is per NEAR-DUP CLUSTER,
    * not per document. A plain per-doc split leaks heavily — a
    * near-duplicate pair straddling train and val means the eval set
    * contains (fuzzy) copies of training documents, inflating every
    * metric it touches. Here documents first resolve to
    * [[DedupClusters]] components over the supplied near-dup `pairs`
    * relation (MinHash-LSH pairs at scale), then the whole cluster
    * inherits one md5-hash-space split decision keyed on its
    * representative.
    *
    * Scale shape: the expensive part is the pair pipeline the caller
    * already runs for dedup (this operator adds pointer-doubling CC —
    * O(log diameter) bounded-size joins — plus one scan-speed split
    * projection). Split stability matches [[Sampling.trainValSplit]]:
    * re-runs and incremental batches keep their assignment as long as
    * cluster representatives are stable. */
  def clusterSplit(docs: DataFrame, pairs: DataFrame,
                   idCol: String = "doc_id",
                   valFraction: Double = 0.1): DataFrame =
    splitFromClusters(DedupClusters.resolve(docs, pairs, idCol), valFraction)

  /** The split projection alone, over an ALREADY-RESOLVED cluster
    * assignment (`doc_id`, `cluster_rep`) — scan-speed, zero shuffle.
    * Production pipelines materialize the cluster table once per
    * corpus snapshot (it feeds dedup, splits, and survivorship alike)
    * and derive splits from the registered table rather than
    * re-running the pair pipeline per consumer. */
  def splitFromClusters(resolved: DataFrame,
                        valFraction: Double = 0.1): DataFrame = {
    require(valFraction >= 0.0 && valFraction <= 1.0)
    resolved.withColumn("split",
      when(md5Long(concat(lit("clsplit:"), col("cluster_rep").cast("string")))
          < Sampling.threshold(valFraction), "val")
        .otherwise("train"))
  }

  /** Soft deduplication: instead of DROPPING near-duplicates, every
    * document keeps a training weight 1/|cluster| (duplicates share
    * one document's worth of gradient — the down-weighting posture
    * several public LLM-data pipelines prefer over hard removal
    * because it preserves rare-but-duplicated content). Input is an
    * already-resolved cluster assignment (doc_id, cluster_rep) — the
    * same registered table [[clusterSplit]]'s build produces.
    *
    * Scale shape: one map-side-combinable count to the cluster-sized
    * sizes table (broadcastable), one join back. The corpus-scale
    * relation shuffles once on cluster_rep; `keep` marks the hard
    * dedup survivor so one output serves both postures. */
  def dedupWeights(resolved: DataFrame,
                   idCol: String = "doc_id"): DataFrame = {
    val sizes = resolved.groupBy("cluster_rep")
      .agg(count(lit(1)).as("_csz"))
    resolved.join(broadcast(sizes), Seq("cluster_rep"))
      .select(col(idCol), col("cluster_rep"),
        round(lit(1.0) / col("_csz"), 6).as("weight"),
        (col(idCol) === col("cluster_rep")).as("keep"))
  }

  /** DSIR-style importance resampling (Xie et al., "Data Selection
    * for Language Models via Importance Resampling", public):
    * documents are drawn in proportion to how much more likely a
    * TARGET-domain unigram LM finds them than the general-corpus LM.
    * log-ratio per token = avg_logp_target − avg_logp_corpus (both
    * from [[TextAnalysis.unigramLogProb]]-shaped scoring over the
    * supplied corpora), and sampling-without-replacement uses the
    * Gumbel-top-k trick: key = logratio + Gumbel(md5-uniform), take
    * the k largest. md5 makes the "randomness" reproducible; the key
    * is rounded with a doc_id tiebreak so the cut is engine-exact.
    *
    * Scale shape: two vocabulary aggregations (map-side combinable,
    * vocab-bounded) broadcast back over ONE corpus token explode; the
    * top-k is a [[graft.plans.TopKPerKey]]-able bounded selection
    * (here global k → TakeOrdered). No shuffle carries the corpus
    * twice, nothing is persisted. */
  def dsirSample(corpus: DataFrame, target: DataFrame, k: Int,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(k >= 1)
    val corpusToks = corpus.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    def lmTable(toks: DataFrame) = {
      val vocab = toks.groupBy("term").agg(count(lit(1)).as("tc"))
      vocab.crossJoin(vocab.agg(sum("tc").cast("double").as("tot")))
    }
    val corpusLm = lmTable(corpusToks)
      .select(col("term"), log(col("tc") / col("tot")).as("lp_c"))
    val targetLm = lmTable(target.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term")))
      .select(col("term"), log(col("tc") / col("tot")).as("lp_t"))
    // tokens absent from the target vocab get the corpus logprob
    // (ratio contribution 0) — the standard smoothing-free fallback
    val scored = corpusToks
      .join(broadcast(corpusLm), Seq("term"))
      .join(broadcast(targetLm), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(avg(coalesce(col("lp_t"), col("lp_c")) - col("lp_c"))
        .as("logratio"))
    // Gumbel(u) = −ln(−ln(u)), u = md5 fraction in (0,1); rounding
    // the key to 6 decimals collapses engine log/exp ulp noise, and
    // (key desc, doc_id) makes the k-cut total-ordered
    val u = (md5Long(concat(lit("dsir:"), col("doc_id").cast("string")))
      .cast("double") + lit(1.0)) / lit((1L << 60).toDouble + 2.0)
    scored
      .withColumn("key", round(col("logratio") - log(-log(u)), 6))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("logratio"), 6).as("logratio"),
        col("key"))
  }

  /** Budget-capped curation: per stratum, take documents in quality
    * order until a cost budget (tokens, chars, bytes) is exhausted —
    * the step that turns "rank everything by quality" into an actual
    * training set of the size the run can afford, per-domain. The
    * cut is a running sum over an explicit total order (quality
    * desc, id asc), so it is engine-exact and stable across re-runs.
    *
    * Scale shape: ONE key-partitioned window (stratum-sharded sort);
    * no joins, no global sort. A document whose cost alone exceeds
    * the budget is excluded by the cumulative test like any other. */
  def budgetSample(docs: DataFrame, stratumCol: String, costCol: String,
                   scoreCol: String, budget: Long,
                   idCol: String = "doc_id"): DataFrame = {
    require(budget > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("cum_cost", sum(col(costCol).cast("long")).over(w))
      .filter(col("cum_cost") <= budget)
      .select(col(idCol), col(stratumCol), col(costCol),
        col(scoreCol), col("cum_cost"))
  }

  /** Contamination audit: how many corpus documents each
    * decontamination tier would flag against a benchmark set — the
    * report a release process reads BEFORE deciding which tier to
    * apply ([[Sampling.decontaminate]] exact, [[
    * Sampling.ngramDecontaminate]] 13-gram, [[
    * Sampling.nearDupDecontaminate]] MinHash near-dup). One row per
    * tier; tiers are independent counts, not a waterfall.
    *
    * Scale shape: each tier is its own already-scale-shaped pipeline
    * reduced to a 1-row count; the three counts union. The corpus is
    * scanned once per tier — an audit run, not a hot path. */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String = "doc_id"): DataFrame =
    contaminationReportFrom(corpus, Seq(
      "exact" -> Sampling.decontaminate(corpus, benchmark),
      "ngram" -> Sampling.ngramDecontaminate(corpus, benchmark),
      "neardup" -> Sampling.nearDupDecontaminate(corpus, benchmark)),
      idCol)

  /** [[contaminationReport]] over PRE-BUILT survivor tables — the
    * production posture: each decontamination tier is its own
    * registered pipeline product (built and owned by its pipeline
    * run, the q203 cluster-table pattern), and the audit report is a
    * cheap consumer of those products rather than a third re-derivation
    * of every tier. `tiers` maps tier name → that tier's survivor
    * relation (rows that PASS the tier).
    *
    * Scale shape: one anti-join + 1-row count per tier; the corpus
    * is scanned once per tier and nothing is re-shingled. */
  def contaminationReportFrom(corpus: DataFrame,
                              tiers: Seq[(String, DataFrame)],
                              idCol: String = "doc_id"): DataFrame = {
    require(tiers.nonEmpty)
    def tier(name: String, survivors: DataFrame) =
      corpus.join(survivors.select(col(idCol)), Seq(idCol), "left_anti")
        .agg(count(lit(1)).as("n_flagged"))
        .select(lit(name).as("tier"), col("n_flagged"))
    tiers.map { case (n, s) => tier(n, s) }.reduce(_ unionAll _)
  }

  /** Calibration report for a [0,1] score against a boolean label:
    * equal-width score bins → per-bin mean score (confidence) vs
    * label rate (accuracy), plus each bin's |gap|·weight term of the
    * Expected Calibration Error. The release-time check that a
    * quality classifier's scores MEAN what downstream thresholds
    * assume. Bin index by integer flooring of score×bins (score 1.0
    * clamps into the top bin), counts exact, ratios rounded.
    *
    * Scale shape: one map-side-combinable aggregation to ≤ bins
    * rows; ECE terms are per-bin closed forms over exact integer
    * counts — order-free. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
                        labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val bin = least(floor(col(scoreCol) * bins).cast("long"),
      lit(bins - 1L))
    val agg = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(bin.as("bin"), col(scoreCol).as("_s"),
        col(labelCol).cast("int").as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        sum("_s").as("_ssum"))
    val tot = agg.agg(sum("n").as("_tot"))
    agg.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_ssum") / col("n"), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("_ssum") / col("n") -
            col("n_pos").cast("double") / col("n")) *
          (col("n").cast("double") / col("_tot")), 6).as("ece_term"))
  }

  /** Murphy decomposition of the Brier score over the same bins as
    * [[calibrationReport]]: Brier ≈ Uncertainty + Reliability −
    * Resolution — the read that separates "the scores are mis-scaled"
    * (reliability, fixable by recalibration) from "the scores can't
    * discriminate" (low resolution, a modeling problem) which the
    * single ECE number conflates. Also reports the EXACT raw Brier
    * (the binned identity holds only for bin-constant forecasts; the
    * gap is within-bin forecast variance — reading both is the
    * point).
    *
    * Exactness: scores arrive round-6 (the repo contract), so
    * s₆ = ⌊s·10⁶ + ½⌋ represents them exactly; Σs₆, Σs₆², Σs₆y are
    * integer/decimal aggregates and the raw Brier numerator
    * Q − 2·10⁶·SY + 10¹²·P is an exact decimal integer. The k-bin
    * reliability/resolution terms quantize ×10¹² before their sums
    * (exact while n_bin·gap²·10¹² < 2⁶³ — n_bin ≲ 9·10⁶ at gap 1;
    * quantize coarser past that). Divisions in a fixed order
    * (Σ / N / 10¹²).
    *
    * Scale shape: ONE map-side-combinable pass to ≤ bins rows, then
    * bins-row arithmetic with a 1-row broadcast. */
  def brierDecomposition(scored: DataFrame, scoreCol: String,
                         labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val s6 = floor(col(scoreCol) * 1e6 + lit(0.5)).cast("long")
    val base = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(least(floor(col(scoreCol) * bins).cast("long"),
        lit(bins - 1L)).as("_b"), s6.as("_s"),
        col(labelCol).cast("long").as("_y"))
    val perB = base.groupBy("_b")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_p"),
        sum("_s").as("_ss"),
        sum(col("_s").cast("decimal(38,0)") * col("_s")).as("_q"),
        sum(col("_s") * col("_y")).as("_sy"))
    val tot = broadcast(perB.agg(sum("_n").as("_TN"), sum("_p").as("_TP"),
      sum(col("_q")).as("_TQ"),
      sum(col("_sy").cast("decimal(38,0)")).as("_TSY")))
    val pbar = col("_ss").cast("double") / col("_n") / 1e6
    val obar = col("_p").cast("double") / col("_n")
    val oAll = col("_TP").cast("double") / col("_TN")
    def q12(c: Column) = floor(c * 1e12 + lit(0.5)).cast("long")
      .cast("decimal(38,0)")
    val terms = perB.crossJoin(tot)
      .select(col("_TN"), col("_TP"), col("_TQ"), col("_TSY"),
        q12(col("_n") * (pbar - obar) * (pbar - obar)).as("_relq"),
        q12(col("_n") * (obar - oAll) * (obar - oAll)).as("_resq"))
    terms.groupBy(col("_TN"), col("_TP"), col("_TQ"), col("_TSY"))
      .agg(sum("_relq").as("_rel"), sum("_resq").as("_res"))
      .select(col("_TN").as("n"),
        round(col("_TP").cast("double") / col("_TN"), 6).as("base_rate"),
        round((col("_TQ") -
            lit(2000000L).cast("decimal(38,0)") * col("_TSY") +
            lit(1000000000000L).cast("decimal(38,0)") *
              col("_TP").cast("decimal(38,0)")).cast("double") /
          col("_TN") / 1e12, 6).as("brier"),
        round((col("_TP").cast("double") / col("_TN")) *
          (lit(1.0) - col("_TP").cast("double") / col("_TN")), 6)
          .as("uncertainty"),
        round(col("_rel").cast("double") / col("_TN") / 1e12, 6)
          .as("reliability"),
        round(col("_res").cast("double") / col("_TN") / 1e12, 6)
          .as("resolution"))
  }

  /** One-row corpus datasheet — the "dataset card" numbers a corpus
    * release ships with, each riding an existing pipeline product:
    * volume (docs, tokens, mean length), language spread (distinct
    * langs, top lang + its share of labeled docs), emptiness, mean
    * quality score, and the near-dup rate read FROM the registered
    * cluster table (a consumer of the q203 build, not a rebuild).
    *
    * Determinism: counts int64; mean quality sums the exactly-
    * representable ×10⁶ quantization of the round-6 score; top lang
    * breaks count ties by language asc.
    *
    * Scale shape: one corpus scan (tokens + quality ride the same
    * projection), one reduced lang agg (top-1 via
    * TakeOrderedAndProject), one clusters-table agg — everything
    * meets in 1-row broadcasts. */
  def datasetCard(docs: DataFrame, clusters: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  langCol: String = "lang"): DataFrame = {
    val nTok = size(tokens(col(textCol)))
    val q6 = floor(qualityScore(col(textCol)) * 1e6 + lit(0.5)).cast("long")
    val base = docs.agg(count(lit(1)).as("n_docs"),
      sum(when(nTok > 0, nTok.cast("long")).otherwise(0L)).as("n_tokens"),
      sum(when(coalesce(nTok, lit(0)) === 0, 1L).otherwise(0L))
        .as("n_empty"),
      sum(q6).as("_q6"), count(q6).as("_nq"))
    val langs = docs.filter(col(langCol).isNotNull)
      .groupBy(col(langCol)).agg(count(lit(1)).as("_lc"))
    val nl = broadcast(langs.agg(count(lit(1)).as("n_langs"),
      sum("_lc").as("_nlabeled")))
    val top = broadcast(langs
      .orderBy(col("_lc").desc, col(langCol)).limit(1)
      .select(col(langCol).as("top_lang"), col("_lc").as("_topc")))
    val dup = broadcast(clusters.agg(count(lit(1)).as("_cn"),
      countDistinct(col("cluster_rep")).as("_cc")))
    base.crossJoin(nl).crossJoin(top).crossJoin(dup)
      .select(col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6)
          .as("mean_tokens"),
        col("n_langs"), col("top_lang"),
        round(col("_topc").cast("double") / col("_nlabeled"), 6)
          .as("top_lang_share"),
        round(col("n_empty").cast("double") / col("n_docs"), 6)
          .as("pct_empty"),
        round(col("_q6").cast("double") / col("_nq") / 1e6, 6)
          .as("mean_quality"),
        round((col("_cn") - col("_cc")).cast("double") / col("_cn"), 6)
          .as("dup_rate"))
  }

  /** Effective-token accounting per stratum: raw tokens vs tokens
    * under [[dedupWeights]]' soft-dedup weighting (each doc counts
    * tokens/|cluster|) — the dataset-economics read that answers
    * "how much UNIQUE signal does each source actually contribute"
    * (a source can be huge in raw tokens yet mostly duplicate mass).
    * Returns per stratum: docs, raw tokens, effective tokens, and
    * the dedup discount 1 − eff/raw.
    *
    * Determinism: per-doc contribution is the exact integer
    * tokens·10⁶ div |cluster|, summed as int64/decimal — order-free;
    * the two reported ratios divide identical operands.
    *
    * Scale shape: one corpus scan for token counts, one join against
    * the REGISTERED cluster table (shuffles on doc_id once; at scale
    * both sides bucket by doc_id), cluster sizes via one map-side
    * count broadcast back; output is strata-sized. */
  def effectiveTokens(docs: DataFrame, clusters: DataFrame,
                      stratumCol: String, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val sizes = clusters.groupBy("cluster_rep").agg(count(lit(1)).as("_csz"))
    val base = docs
      .select(col(idCol), col(stratumCol).as("_st"),
        size(tokens(col(textCol))).cast("long").as("_tok"))
      .join(clusters.select(col(idCol), col("cluster_rep")), Seq(idCol))
      .join(broadcast(sizes), Seq("cluster_rep"))
    base.groupBy(col("_st").as(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_tok") > 0, col("_tok")).otherwise(0L))
          .as("raw_tokens"),
        sum(expr("(greatest(_tok, 0L) * 1000000L) div _csz")
          .cast("decimal(38,0)")).as("_eff"))
      .select(col(stratumCol), col("n_docs"), col("raw_tokens"),
        round(col("_eff").cast("double") / 1e6, 6).as("effective_tokens"),
        round(when(col("raw_tokens") > 0,
          lit(1.0) - col("_eff").cast("double") / 1e6 /
            col("raw_tokens")), 6).as("dedup_discount"))
  }

  /** Cluster-size histogram over a resolved cluster assignment: how
    * many clusters of each size the near-dup graph produced — the
    * one-glance audit of dedup aggressiveness (a fat tail of huge
    * clusters usually means the pair threshold is too loose).
    * Fourth consumer of the registered cluster table.
    *
    * Scale shape: two map-side-combinable aggregations, output ≤
    * max-cluster-size rows. */
  def clusterSizeHistogram(resolved: DataFrame): DataFrame =
    resolved.groupBy("cluster_rep").agg(count(lit(1)).as("_sz"))
      .groupBy(col("_sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Balanced output sharding: assign documents to `shards` output
    * buckets so per-shard total cost (chars, tokens, bytes) is
    * near-equal — round-robin over the cost-descending rank (the
    * classic LPT approximation without sequential state; within
    * 2× of optimal imbalance for heavy-tailed sizes, exact for
    * equal sizes). The write-layout planner for "N similar-sized
    * output files", replacing size-oblivious `repartition(N)`.
    *
    * Scale shape: one global rank over (cost desc, id) — a single
    * total-order sort, the price of determinism; at petabyte scale
    * swap in range-partitioned bucketing by cost quantiles at the
    * same output contract. */
  def balancedShards(docs: DataFrame, costCol: String, shards: Int,
                     idCol: String = "doc_id"): DataFrame = {
    require(shards >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(costCol).desc, col(idCol))
    docs.select(col(idCol), col(costCol))
      .withColumn("shard", (row_number().over(w) - 1) % shards)
  }

  /** Equal-frequency (quantile) binning with MATERIALIZED cutoffs:
    * fit exact rank-selected cutoffs on one relation, apply them as a
    * broadcast to any other — the fit/transform split rank-based
    * `ntile` can't give you (ntile re-ranks whatever data it sees, so
    * train-time and serve-time bins silently diverge). Cutoff d
    * (d = 1..bins−1) is the smallest value whose cumulative count
    * reaches ⌊d·n/bins⌋ — exactly the value at that 1-based rank in
    * value order, selected with INTEGER thresholds, no interpolation.
    * bin(x) = #{cutoffs < x}: right-closed bins, out-of-range data
    * clamps to the edge bins, tied cutoffs legitimately skip bins.
    *
    * Scale shape: NO corpus-sized window — counts collapse to the
    * DISTINCT-value relation first (map-side combinable), the
    * running sum rides that bounded relation (the q136 collapsed-
    * dimension pattern), thresholds derive in-query from max(cum)
    * (no driver count), and the apply is a broadcast of ≤ bins−1
    * cutoffs into a scan-speed counting expression. */
  def quantileBins(fit: DataFrame, apply: DataFrame, valueCol: String,
                   bins: Int = 10,
                   idCol: String = "doc_id"): DataFrame = {
    require(bins >= 2)
    val wv = org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = fit.groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum("_c").over(wv))
    val thresholds = cum.agg(max("_cum").as("_n"))
      .select(explode(sequence(lit(1), lit(bins - 1))).as("_d"), col("_n"))
      .select(col("_d"), expr(s"(_d * _n) div $bins").as("_t"))
      .filter(col("_t") >= 1)
    val cuts = cum.join(broadcast(thresholds), col("_cum") >= col("_t"))
      .groupBy("_d").agg(min("_v").as("_cut"))
      .agg(sort_array(collect_list(col("_cut"))).as("_cuts"))
    apply.crossJoin(broadcast(cuts))
      .select(col(idCol), col(valueCol),
        aggregate(col("_cuts"), lit(0),
          (acc, c) => acc + when(c < col(valueCol), 1).otherwise(0))
          .as("bin"))
  }

  /** Model-based quality gate: a fixed-weight logistic score over the
    * engine's scan-speed text features (length, stopword density,
    * alpha density, mean token length). The WEIGHTS here are a
    * documented placeholder for a trained classifier's — a real
    * pipeline broadcasts learned coefficients the same way (the
    * fasttext-style quality-filter stage); the Spark shape (feature
    * projection fused into the scan, zero shuffles, score + boolean
    * gate) is the real contract.
    *
    * Determinism: features are exact ratios of integer counts,
    * sigmoid is rounded to 6 decimals, and the gate compares the
    * ROUNDED score so both engines cut identically. */
  def qualityLogit(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   threshold: Double = 0.5): DataFrame = {
    val score = qualityScore(col(textCol))
    docs.select(col(idCol), score.as("score"),
      (score >= lit(threshold)).as("keep"))
  }

  /** The [[qualityLogit]] score as a bare `Column` — so consumers
    * (budget sampling, gates inside wider pipelines) fuse it into
    * their own scan instead of joining the corpus to a scored copy
    * of itself. A corpus-to-corpus score join is exactly the shape
    * that broadcasts a corpus at 100 TB. */
  def qualityScore(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val safeTok = when(nTok > 0, nTok)
    val stopRatio = coalesce(
      stopwordCount(toks, StopEn).cast("double") / safeTok,
      lit(0.0))
    val alphaRatio = coalesce(
      size(regexp_extract_all(lower(text), lit("[a-z]"), lit(0)))
        .cast("double") / when(length(text) > 0, length(text).cast("double")),
      lit(0.0))
    val meanTokLen = coalesce(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double")
        / safeTok, lit(0.0))
    // z = b0 + b1·ln(1+nTok) + b2·stop + b3·alpha + b4·meanLen
    val z = lit(-3.0) + log(lit(1.0) + nTok) * lit(0.55) +
      stopRatio * lit(4.0) + alphaRatio * lit(1.5) + meanTokLen * lit(-0.05)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Output-shard manifest: per shard, the row count, total payload
    * cost, and an ORDER-FREE content checksum (bit-XOR of the 60-bit
    * md5 of each row's id:payload) — the export-integrity artifact
    * that lets a consumer verify a delivered shard without re-reading
    * the producer's data, and lets the producer re-derive it after a
    * rewrite to prove nothing changed. XOR is commutative/associative
    * with no overflow semantics to disagree on — the only aggregate
    * whose value is identical on any engine at any partitioning
    * WITHOUT quantization tricks.
    *
    * Scale shape: one map-side-combinable shard agg; the checksum
    * folds in the same pass as the counts. */
  def outputManifest(assigned: DataFrame, shardCol: String,
                     idCol: String, payload: org.apache.spark.sql.Column,
                     costCol: String): DataFrame =
    assigned
      .withColumn("_ck", md5Long(concat(col(idCol).cast("string"),
        lit(":"), payload.cast("string"))))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(costCol).cast("long")).as("total_cost"),
        expr("bit_xor(_ck)").as("checksum"))

  /** One-hot / index encoding with a FITTED vocabulary: the top-k
    * categories by frequency (ties broken by category value — the
    * determinism a bare `ORDER BY count DESC LIMIT k` throws away)
    * get indices 0..k−1 in (count desc, category asc) order; every
    * other or unseen category maps to index k ("OTHER") — the
    * train/serve-stable categorical encoder. Fit and apply are
    * separate inputs (same materialized-vocabulary semantics as
    * [[quantileBins]]): applying yesterday's vocabulary to today's
    * data is the production contract, refitting silently is the bug.
    *
    * Scale shape: fit is one map-side-combined category count + a
    * row_number over the BOUNDED distinct-category relation; apply
    * is a broadcast left join — scan speed, no shuffle of the data.
    * A vocabulary too big to broadcast is not a vocabulary you
    * one-hot (that's what [[featureHash]] is for — documented trade). */
  def onehotVocab(fit: DataFrame, apply: DataFrame, catCol: String,
                  k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1)
    val wv = org.apache.spark.sql.expressions.Window
      .orderBy(col("_c").desc, col("_cat"))
    val vocab = fit.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("_cat")).agg(count(lit(1)).as("_c"))
      .withColumn("_idx", (row_number().over(wv) - 1).cast("long"))
      .filter(col("_idx") < k)
      .select(col("_cat"), col("_idx"))
    apply.join(broadcast(vocab), apply(catCol) === col("_cat"), "left")
      .select(col(idCol), col(catCol),
        coalesce(col("_idx"), lit(k.toLong)).as("index"),
        col("_idx").isNull.as("is_other"))
  }

  /** Standard scaler with a FITTED mean/std: z = (x − μ)/σ where μ
    * and the SAMPLE std σ (n−1 denominator) come from the `fit`
    * slice and are applied to the `apply` slice — the train/serve
    * split every leakage-aware feature pipeline needs (fitting the
    * scaler on the full table leaks val statistics into training).
    * Degenerate fits (σ = 0 or n < 2) yield null z, not ±Inf.
    *
    * Exactness: the metric is `scale`-quantized (default cents), so
    * n and Σq are exact int64 and Σq² is exact decimal(38,0) —
    * order-free; μ and σ are then a handful of correctly-rounded
    * double ops on identical operands, and each row's z is two more.
    *
    * Scale shape: fit is ONE map-side-combined moment agg reduced to
    * a 1-row broadcast; apply is a scan-speed projection. Zero
    * shuffles of either slice. */
  def standardScaler(fit: DataFrame, apply: DataFrame, valueCol: String,
                     idCol: String, scale: Long = 100L): DataFrame = {
    require(scale >= 1)
    val q = floor(col(valueCol).cast("double") * scale + lit(0.5))
      .cast("long")
    val stats = fit.filter(col(valueCol).isNotNull)
      .select(q.as("_q"))
      .agg(count(lit(1)).as("_n"), sum("_q").as("_s"),
        sum(col("_q").cast("decimal(38,0)") * col("_q")).as("_qq"))
    val nD = col("_n").cast("double")
    val mu = col("_s").cast("double") / nD
    val sd = sqrt((col("_qq").cast("double") - col("_s").cast("double") *
      col("_s") / nD) / (nD - 1))
    apply.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(stats))
      .select(col(idCol), col(valueCol),
        round(when(col("_n") > 1 && sd > 0, (q - mu) / sd), 6).as("z"))
  }

  /** Mondrian (class-conditional) split-conformal coverage audit —
    * [[graft.operators.Analytics.conformalOls]]'s classification
    * sibling: per class, each test row's p-value is
    * `(1 + #{calibration rows of the same class with nonconformity ≥
    * the test row's}) / (n_cal + 1)`, and the row is covered at
    * level α when p > α. Class-conditional calibration is what makes
    * the guarantee hold PER CLASS (plain conformal lets a dominant
    * class subsidize a rare one). Returns one row per class:
    * (class, n_cal, n_test, n_covered, coverage ≈ 1−α for
    * exchangeable data).
    *
    * Exactness: the rank count rides ONE union sort per class with
    * calibration rows ordered BEFORE test rows at nonconformity
    * ties (so the running calibration count at a test row is
    * exactly #{a_cal ≥ a_test}), and the coverage test is the
    * integer cross-multiplication `(1+cnt)·αDen > αNum·(n_cal+1)` —
    * no float ever decides membership.
    *
    * Scale shape: calibration folds are bounded by design (the
    * q273 contract); the one sort covers cal+test per class and
    * everything else is map-side aggregation. */
  def mondrianConformal(cal: DataFrame, test: DataFrame, classCol: String,
                        nonconfCol: Column, idCol: Column,
                        alphaNum: Long = 1L,
                        alphaDen: Long = 10L): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen)
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, tag: Int) =
      df.filter(col(classCol).isNotNull && nonconfCol.isNotNull)
        .select(col(classCol).as("_cls"), nonconfCol.as("_a"),
          lit(tag).as("_tag"), idCol.cast("long").as("_tid"))
    val u = side(cal, 0).unionAll(side(test, 1))
    val w = Window.partitionBy("_cls")
      .orderBy(col("_a").desc, col("_tag"), col("_tid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val nCal = Window.partitionBy("_cls")
    u.withColumn("_cnt",
        sum(when(col("_tag") === 0, 1L).otherwise(0L)).over(w))
      .withColumn("_ncal",
        sum(when(col("_tag") === 0, 1L).otherwise(0L)).over(nCal))
      .filter(col("_tag") === 1)
      .groupBy(col("_cls").as(classCol))
      .agg(max("_ncal").as("n_cal"), count(lit(1)).as("n_test"),
        sum(when((lit(1L) + col("_cnt")) * alphaDen >
          lit(alphaNum) * (col("_ncal") + 1), 1L).otherwise(0L))
          .as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered").cast("double") / col("n_test"), 6))
  }

  /** Dedup-pressure monitor: as the corpus grows in arrival order,
    * what fraction of each new batch is an exact duplicate of
    * anything earlier — the marginal-duplicate curve that says WHEN
    * to re-run the expensive near-dup pipeline (a crawl whose
    * marginal dup rate crosses ~40% is mostly re-fetching itself).
    * Buckets the id-ordered stream into `bucket`-sized batches and
    * reports per batch: rows, duplicates-of-prior, marginal dup
    * rate, and the cumulative unique count. A duplicate is a row
    * whose normalized-content fingerprint first appeared at a lower
    * id (within-batch repeats count too — they are equally wasted
    * fetches).
    *
    * Scale shape: one fingerprint agg (map-side min) + one key-equi
    * join; the cumulative window runs over the BOUNDED bucket
    * relation. In production id-order is ingest order, so the curve
    * appends incrementally. */
  def dedupPressure(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    bucket: Long = 50L): DataFrame = {
    require(bucket >= 1)
    import graft.functions.TextFunctions.fingerprint64
    import org.apache.spark.sql.expressions.Window
    val fp = docs.select(col(idCol).as("_id"),
      fingerprint64(col(textCol)).as("_fp"))
    val first = fp.groupBy("_fp").agg(min("_id").as("_first"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    fp.join(first, Seq("_fp"))
      .withColumn("_dup", col("_id") > col("_first"))
      .groupBy(expr(s"_id div $bucket").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_rate",
        round(col("n_dup").cast("double") / col("n"), 6))
      .withColumn("cum_unique",
        sum(col("n") - col("n_dup")).over(w).cast("long"))
  }

  /** One-step DoReMi-style domain reweighting: per source, the
    * unigram-LM loss excess over the corpus average drives a
    * multiplicative-weights update `w_s ∝ share_s · exp(η·excess_s)`
    * — up-weight the domains the reference model fits WORST (they
    * carry the signal the model hasn't absorbed), starting from the
    * token-share baseline. This is the one-iteration, unigram-proxy
    * form of the DoReMi recipe (proxy-model losses slot into the
    * same shape); `excess` clamps at 0 so easy domains only lose
    * weight through normalization. Returns one row per source:
    * (source, n_tokens, loss, excess, weight), Σ weight = 1.
    *
    * Exactness: per-term ln p quantizes to ×10⁹ int64 ONCE per
    * vocabulary term, source sums ride exact `cnt·q` integers, and
    * the softmax denominator sums ×10⁶-quantized terms — engine-
    * identical at every reduction.
    *
    * Scale shape: one token explode → (source, term) reduced counts
    * (map-side combined), the vocabulary-bounded LM broadcast onto
    * it, then sources-bounded arithmetic. The corpus shuffles once,
    * as reduced counts. */
  def domainReweight(docs: DataFrame, sourceCol: String = "source",
                     textCol: String = "text",
                     eta: Double = 1.0): DataFrame = {
    val toks = docs.filter(col(sourceCol).isNotNull)
      .select(col(sourceCol).as("_src"),
        explode(tokens(col(textCol))).as("_t"))
    val tf = toks.groupBy("_t").agg(count(lit(1)).as("_cnt"))
    val tot = broadcast(tf.agg(sum("_cnt").as("_tot")))
    val lm = broadcast(tf.crossJoin(tot).select(col("_t"),
      floor(log(col("_cnt").cast("double") / col("_tot")) * 1e9 + lit(0.5))
        .cast("long").as("_q")))
    val bySrc = toks.groupBy("_src", "_t").agg(count(lit(1)).as("_c"))
      .join(lm, Seq("_t"))
      .groupBy("_src")
      .agg(sum(col("_c") * col("_q")).as("_qs"), sum("_c").as("n_tokens"))
      .withColumn("loss", -(col("_qs").cast("double") / 1e9) /
        col("n_tokens"))
    val ref = broadcast(bySrc.agg(sum("_qs").as("_qg"),
      sum("n_tokens").as("_ng")))
    val ex = bySrc.crossJoin(ref)
      .withColumn("excess", greatest(
        col("loss") - (-(col("_qg").cast("double") / 1e9) / col("_ng")),
        lit(0.0)))
      // quantize the BOUNDED multiplier exp(excess·η) alone (excess
      // is a per-source mean-loss gap, so the exp stays small), then
      // multiply by the exact token count in decimal(38,0) — the old
      // floor(n_tokens·exp·1e6) form saturated Long.MaxValue once a
      // source held ~9.2e12 effective tokens
      .withColumn("_eq",
        floor(exp(col("excess") * eta) * 1e6 + lit(0.5)).cast("long")
          .cast("decimal(38,0)") * col("n_tokens"))
    val den = broadcast(ex.agg(sum("_eq").as("_den")))
    ex.crossJoin(den).select(col("_src").as(sourceCol), col("n_tokens"),
      round(col("loss"), 6).as("loss"),
      round(col("excess"), 6).as("excess"),
      round(col("_eq").cast("double") / col("_den").cast("double"), 6)
        .as("weight"))
  }

  /** Cross-source duplication matrix — a provenance consumer of the
    * materialized near-dup cluster table: for every source pair
    * (a ≤ b), how many clusters contain a near-dup pair spanning
    * those sources. The diagonal (a = b) is intra-source duplication
    * (a feed re-crawling itself); heavy off-diagonal cells say which
    * crawls copy which — the evidence behind "drop feed X, it's 90%
    * feed Y".
    *
    * Scale shape: the cluster table joins the doc→source projection
    * once (key-equi); the pair expansion is WITHIN clusters only, so
    * it rides cluster size² — bounded by the same upstream caps that
    * keep the MinHash pair stage bounded; distinct-per-cluster
    * reduces before the final pair-keyed count. */
  /** Filter-disparity audit: per group, how much of it a boolean
    * gate keeps, and each group's selection rate as a RATIO of the
    * highest-rate group's (the four-fifths-rule reading) — a quality
    * gate tuned on one language family can silently halve another
    * source's representation, and this is the one-glance audit that
    * catches the mixture shift before training does. Returns
    * (group, n, n_kept, rate, rate_ratio). NULL-group rows are
    * excluded; a NULL `kept` counts as dropped (a row the gate
    * cannot score is a row the pipeline loses).
    *
    * Exactness: rates are single divisions of exact counts; the
    * reference group is the rank-1 row of (rounded rate DESC, group)
    * — deterministic under ties — and the ratio cross-multiplies
    * exact counts before one double division. All-zero gates report
    * NULL ratios, not 0/0.
    *
    * Scale shape: one map-side-combinable group agg + a broadcast
    * 1-row reference; the only window runs over the groups-bounded
    * relation. */
  def filterDisparity(docs: DataFrame, groupCol: String,
                      kept: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
    val w = Window.orderBy(
      round(col("n_kept").cast("double") / col("n"), 6).desc, col("group"))
    val mx = broadcast(g.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("n_kept").as("_mk"), col("n").as("_mn")))
    g.crossJoin(mx).select(col("group"), col("n"), col("n_kept"),
      round(col("n_kept").cast("double") / col("n"), 6).as("rate"),
      round(when(col("_mk") > 0,
        (col("n_kept").cast("double") * col("_mn")) /
          (col("n").cast("double") * col("_mk"))), 6).as("rate_ratio"))
  }

  def sourceDuplicationMatrix(resolved: DataFrame, docs: DataFrame,
                              idCol: String = "doc_id",
                              sourceCol: String = "source"): DataFrame = {
    val sp = resolved.join(docs.select(col(idCol), col(sourceCol)),
      Seq(idCol))
    val a = sp.select(col("cluster_rep"), col(idCol).as("_da"),
      col(sourceCol).as("_sa"))
    val b = sp.select(col("cluster_rep"), col(idCol).as("_db"),
      col(sourceCol).as("_sb"))
    a.join(b, Seq("cluster_rep")).filter(col("_da") < col("_db"))
      .select(col("cluster_rep"), least(col("_sa"), col("_sb")).as("source_a"),
        greatest(col("_sa"), col("_sb")).as("source_b"))
      .distinct()
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_clusters"))
  }

  /** Cross-source quantile normalization (batch-effect removal): map
    * each group's value DISTRIBUTION onto the pooled reference — a
    * row at within-group quantile position q gets the GLOBAL value
    * at position q, so "top decile by this crawler's scorer" means
    * the same thing for every source even when scorers drift. Rank
    * mapping is pure int64 (`k = 1 + ((r−1)·(N−1)·2 + (n_g−1)) div
    * (2·(n_g−1))` — round-half-up of (r−1)/(n_g−1)·(N−1)), ties
    * break on (value, id) on BOTH sides, singleton groups map to the
    * global median. Normalizing one group onto itself is the
    * identity (spec-pinned).
    *
    * Scale shape: one window per group plus ONE global sort for the
    * reference order statistics — the exact form; at 100 TB the
    * reference becomes a B-bucket approx-quantile table (one agg,
    * broadcast) and the rank join becomes a bucket lookup, same
    * contract. The final rank equi-join shuffles only (id, k)
    * pairs against the N-row reference. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: Column,
                        idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(valueCol.isNotNull)
      .select(col(idCol).as("_id"), col(groupCol).as("_g"),
        valueCol.cast("long").as("_v"))
    val wg = Window.partitionBy("_g").orderBy(col("_v"), col("_id"))
    val ranked = base
      .withColumn("_r", row_number().over(wg).cast("long"))
      .withColumn("_ns", count(lit(1)).over(Window.partitionBy("_g")))
    val glob = base
      .withColumn("_k", row_number()
        .over(Window.orderBy(col("_v"), col("_id"))).cast("long"))
      .select(col("_k"), col("_v").as("normalized"))
    val n = broadcast(base.agg(count(lit(1)).as("_n")))
    ranked.crossJoin(n)
      .withColumn("_k", when(col("_ns") > 1,
          lit(1L) + expr("((_r - 1) * (_n - 1) * 2 + (_ns - 1)) " +
            "div (2 * (_ns - 1))"))
        .otherwise(lit(1L) + expr("(_n - 1) div 2")))
      .join(glob, Seq("_k"))
      .select(col("_id").as(idCol), col("_g").as(groupCol),
        col("_v").as("value"), col("normalized"))
  }

  /** Iterative proportional fitting (raking) of per-cell sampling
    * weights: make the corpus's (dim1 × dim2) WEIGHTED marginals
    * match a reference population's, without touching the joint —
    * the survey-statistics workhorse behind "rebalance by language
    * AND by source simultaneously" ([[domainReweight]] reweights one
    * dimension by loss; raking satisfies two marginal systems at
    * once, which no single-dimension scaling can). `rounds`
    * alternating proportional scalings (dim1 then dim2); 3 rounds is
    * the classic near-fixpoint for well-conditioned tables and the
    * documented truncation.
    *
    * Expected counts come from the reference's marginal SHARES
    * scaled to the corpus size. Cells empty in the corpus get no
    * weight (standard raking; a reference marginal with zero corpus
    * mass keeps its shortfall — reported via the achieved columns).
    *
    * Determinism: weights live ×10⁹-quantized on the CELL relation
    * (cardinality |dim1|·|dim2|, not rows), every marginal sum is an
    * exact decimal(38,0) fold (the ×10⁹ weights make int64 wrap past
    * ~9.2e9 weighted rows per marginal — decimal matches the house
    * contract and the dual's HUGEINT), and each scaling factor is
    * one fixed double ratio — engine- and partitioning-independent.
    *
    * Returns (dim1, dim2, n, weight, weighted_n).
    *
    * Scale shape: one (dim1, dim2) reduced shuffle builds the cell
    * table; each half-round is a broadcast join of a marginal agg
    * back onto cells. Everything after the first reduction is
    * cell-cardinality-sized — at 100 TB the cells are a few hundred
    * rows regardless of corpus size. */
  def ipfRake(corpus: DataFrame, reference: DataFrame, dim1: String,
              dim2: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1)
    val cells = corpus.filter(col(dim1).isNotNull && col(dim2).isNotNull)
      .groupBy(col(dim1).as("_d1"), col(dim2).as("_d2"))
      .agg(count(lit(1)).as("_n"))
    val refBase = reference
      .filter(col(dim1).isNotNull && col(dim2).isNotNull)
    val ref1 = refBase.groupBy(col(dim1).as("_d1"))
      .agg(count(lit(1)).as("_r1"))
    val ref2 = refBase.groupBy(col(dim2).as("_d2"))
      .agg(count(lit(1)).as("_r2"))
    val totals = broadcast(cells.agg(sum("_n").as("_N"))
      .crossJoin(refBase.agg(count(lit(1)).as("_T"))))
    // expected marginal counts at corpus scale, as fixed doubles
    val e1 = broadcast(ref1.crossJoin(totals).select(col("_d1"),
      (col("_r1").cast("double") * col("_N") / col("_T")).as("_e1")))
    val e2 = broadcast(ref2.crossJoin(totals).select(col("_d2"),
      (col("_r2").cast("double") * col("_N") / col("_T")).as("_e2")))
    var w = cells.withColumn("_wq", lit(1000000000L))
    for (_ <- 1 to rounds) {
      val s1 = w.groupBy("_d1").agg(
        sum(col("_n").cast("decimal(38,0)") * col("_wq")).as("_s1"))
      w = w.join(broadcast(s1), Seq("_d1")).join(e1, Seq("_d1"), "left")
        .withColumn("_wq", when(col("_e1").isNotNull && col("_s1") > 0,
          floor(col("_wq") * (col("_e1") * 1e9 /
            col("_s1").cast("double")) + lit(0.5)).cast("long"))
          .otherwise(col("_wq")))
        .select("_d1", "_d2", "_n", "_wq")
      val s2 = w.groupBy("_d2").agg(
        sum(col("_n").cast("decimal(38,0)") * col("_wq")).as("_s2"))
      w = w.join(broadcast(s2), Seq("_d2")).join(e2, Seq("_d2"), "left")
        .withColumn("_wq", when(col("_e2").isNotNull && col("_s2") > 0,
          floor(col("_wq") * (col("_e2") * 1e9 /
            col("_s2").cast("double")) + lit(0.5)).cast("long"))
          .otherwise(col("_wq")))
        .select("_d1", "_d2", "_n", "_wq")
        // eager checkpoint per round (the connectedComponents
        // precedent): each half-round references the previous `w`
        // TWICE (directly + via its marginal sum), so the lazy plan
        // doubled per half-round — ~2^(2·rounds) copies of the cell
        // subtree reaching Catalyst (r14; runtime exchange reuse hid
        // the execution cost but not the planning). The checkpointed
        // frame is cell-table-sized (|dim1|×|dim2| rows) at any
        // corpus scale; values are unchanged.
        .localCheckpoint(true)
    }
    w.select(col("_d1").as(dim1), col("_d2").as(dim2), col("_n").as("n"),
      round(col("_wq").cast("double") / 1e9, 6).as("weight"),
      round(col("_n").cast("double") * col("_wq") / 1e9, 6)
        .as("weighted_n"))
  }
}
