package graft.operators

import graft.functions.HashFunctions.md5Long
import graft.functions.TextFunctions.fingerprint64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling and decontamination for training-data
  * pipelines (SURVEY.md §2.11 extension surface).
  *
  * Sampling is HASH-based, not RNG-based: a row's fate depends only
  * on its key, never on partitioning, task retries, or Spark's seed
  * plumbing — the property that makes a 100 TB train/val split
  * reproducible across reruns, engines (md5 everywhere), and
  * incremental batches (a document keeps its split when it reappears).
  * `df.sample()`/`rand()` guarantee none of that.
  */
object Sampling {

  /** 60-bit hash-space threshold for a fraction (public so oracle
    * duals can interpolate the identical integer literal). */
  def threshold(fraction: Double): Long =
    (fraction * (1L << 60).toDouble).toLong

  /** Keep rows whose md5(key) lands in the first `fraction` of the
    * hash space. Pure filter: scan-speed, no shuffle, no state. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(md5Long(key.cast("string")) < threshold(fraction))
  }

  /** Deterministic WEIGHTED Bernoulli sample: keep probability
    * p_i = min(1, rate · w_i / mean_w), decided by whether md5(key)
    * lands in the first p_i of the 60-bit hash space. With w = token
    * count this is token-budget-proportional document sampling
    * (uniform over TOKENS, the budget that actually matters), the
    * importance-sampling primitive behind quality-weighted corpus
    * mixing. Expected kept fraction ≈ `rate` (exact when no p_i
    * clamps at 1).
    *
    * Scale/portability shape: one broadcast stats pass for mean_w,
    * then a scan-speed filter — no shuffle, no state, repeatable
    * across runs AND engines. Weights must be INTEGRAL (`long`):
    * mean_w = Σw / n with an exact integer Σw is order-free, where a
    * double `avg` would be partial-sum-order-dependent and break
    * replay (the q83 quantization lesson). No transcendentals — the
    * Efraimidis–Spirakis u^(1/w) key would hinge on cross-engine
    * `pow` ulps; the threshold form is plain arithmetic with one
    * explicit floor. */
  def weightedSample(df: DataFrame, weight: Column, key: Column,
                     rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    val st = broadcast(df.agg(
      sum(weight.cast("long")).as("_sw"), count(lit(1)).as("_nw")))
    val meanW = col("_sw").cast("double") / col("_nw").cast("double")
    val p = least(lit(1.0), lit(rate) * weight.cast("double") / meanW)
    df.crossJoin(st)
      .filter(md5Long(key.cast("string")) <
        floor(p * lit((1L << 60).toDouble)).cast("long"))
      .drop("_sw", "_nw")
  }

  /** Deterministic train/val split: adds a `split` column ("val" for
    * the first `valFraction` of the hash space, "train" otherwise). */
  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    * each row draws a deterministic uniform u from the md5 hash
    * space and competes with key u^(1/w) — the top-`k` keys are an
    * exact weighted-without-replacement sample. Complements
    * [[weightedSample]] (Bernoulli, WITH-replacement flavor, random
    * size): this one returns EXACTLY k rows, no row twice. Keys are
    * rounded (9) BEFORE ranking so a last-ulp `pow` difference can
    * never reorder the cut; ties break by the row key.
    *
    * Scale shape: scan-speed key computation + a global top-k that
    * plans as TakeOrderedAndProject — bounded heaps per partition,
    * never a full sort. */
  def weightedTopKSample(df: DataFrame, weight: Column, key: Column,
                         k: Int, salt: String = "es:"): DataFrame = {
    require(k >= 1)
    val u = graft.functions.HashFunctions
      .md5Long(concat(lit(salt), key.cast("string")))
      .cast("double") / lit(1.152921504606846976e18) // 2^60
    df.filter(weight > 0)
      .withColumn("es_key",
        round(pow(u, lit(1.0) / weight.cast("double")), 9))
      .orderBy(col("es_key").desc, key)
      .limit(k)
  }

  def trainValSplit(df: DataFrame, key: Column,
                    valFraction: Double): DataFrame = {
    require(valFraction >= 0.0 && valFraction <= 1.0)
    df.withColumn("split",
      when(md5Long(key.cast("string")) < threshold(valFraction), "val")
        .otherwise("train"))
  }

  /** Stratified deterministic sampling: each stratum (language,
    * source domain, quality band …) keeps its own fraction of the
    * hash space — the corpus re-balancing step that downsamples the
    * dominant stratum and keeps rare ones at ingest. Like all
    * sampling here it is hash-determined per key, so re-runs and
    * incremental batches agree row-by-row.
    *
    * Thresholds are computed driver-side ([[threshold]]) and ride a
    * broadcast join keyed by stratum; the corpus itself is filtered
    * at scan speed with zero shuffles. Strata absent from `fractions`
    * fall back to `defaultFraction`. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val rates = broadcast(
      fractions.toSeq.map { case (s, f) => (s, threshold(f)) }
        .toDF("_stratum", "_thr"))
    df.join(rates, stratum === col("_stratum"), "left")
      .filter(md5Long(key.cast("string")) <
        coalesce(col("_thr"), lit(threshold(defaultFraction))))
      .drop("_stratum", "_thr")
  }

  /** Benchmark decontamination: drop corpus documents whose
    * normalized-content fingerprint appears in the benchmark set —
    * the exact-match tier of decontaminating training data against
    * eval sets. A left-anti join on the 64-bit fingerprint: the
    * benchmark side is tiny and broadcast; the corpus never shuffles.
    * Near-match tiers compose from the same table via
    * [[FuzzyDedup.minhashNearDups]] / [[FuzzyDedup.fingerprintPairs]]
    * on the union of corpus and benchmark. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    corpusText: String = "text",
                    benchmarkText: String = "text"): DataFrame = {
    val bfp = broadcast(
      benchmark.select(fingerprint64(col(benchmarkText)).as("_bfp")).distinct())
    corpus.join(bfp,
      fingerprint64(col(corpusText)) === col("_bfp"), "left_anti")
  }

  /** Mixture weighting ("data mixing"): turn per-stratum target
    * weights into deterministic per-document repeat counts — the step
    * that materializes a training mixture (upsample rare domains,
    * downsample dominant ones, fractional epochs) from a curated
    * corpus. A weight w gives every doc ⌊w⌋ copies plus one more for
    * the deterministic hash-fraction frac(w) of its stratum; docs
    * drawing 0 copies are dropped. Expected copies per doc = w
    * exactly, reproducible across reruns/engines/batches (same
    * hash-space trick as [[stratifiedSample]] — in fact w ≤ 1 IS
    * stratified sampling).
    *
    * Scale shape: broadcast weights join + a per-row `sequence`
    * explode — output size is the mixture size, no shuffle. */
  def weightedRepeat(df: DataFrame, stratum: Column, key: Column,
                     weights: Map[String, Double],
                     defaultWeight: Double = 1.0): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0.0),
      "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    def split(w: Double) = (w.toLong, threshold(w - w.toLong))
    val rates = broadcast(
      weights.toSeq.map { case (s, w) => val (f, t) = split(w); (s, f, t) }
        .toDF("_stratum", "_floor", "_thr"))
    val (df0, dt0) = split(defaultWeight)
    val nCopies = coalesce(col("_floor"), lit(df0)) +
      when(md5Long(key.cast("string")) < coalesce(col("_thr"), lit(dt0)), 1L)
        .otherwise(0L)
    df.join(rates, stratum === col("_stratum"), "left")
      .withColumn("_n", nCopies)
      .withColumn("copy_idx",
        explode(when(col("_n") >= 1, sequence(lit(1L), col("_n")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("_stratum", "_floor", "_thr", "_n")
  }

  /** Temperature-flattened mixture (the multilingual `p ∝ n^α`
    * sampling law, mC4/XLM-style): strata are re-weighted so the
    * TARGET distribution is proportional to count^α — α = 1 keeps the
    * natural mix, α → 0 approaches uniform, 0.3–0.7 is the usual
    * "upsample the tail without drowning the head" band. Corpus size
    * is preserved in expectation: per-doc weight
    * w_s = N·n_s^(α−1) / Σ_t n_t^α, materialized as deterministic
    * repeat counts exactly like [[weightedRepeat]] (⌊w⌋ copies + one
    * extra for the md5-hash fraction of keys).
    *
    * Engine portability: weights are rounded to 6 decimals before the
    * floor/threshold split (pow/sum are the only FP-order-sensitive
    * steps; at ≤10⁶ strata the rounding absorbs them), and the
    * fractional cut uses an explicit floor into the 60-bit hash
    * space — double→int64 CASTS round on some engines and truncate on
    * others, so the floor is spelled out.
    *
    * Scale shape: one map-side-combinable stratum count, a broadcast
    * rate table, then the scan-speed explode — identical to
    * [[weightedRepeat]]; nothing shuffles but the tiny count. */
  def temperatureMixture(df: DataFrame, stratum: Column, key: Column,
                         alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val counts = df.groupBy(stratum.as("_stratum"))
      .agg(count(lit(1)).cast("double").as("_n"))
    val tot = broadcast(counts.agg(
      sum("_n").as("_tot"), sum(pow(col("_n"), alpha)).as("_zsum")))
    val rates = broadcast(counts.crossJoin(tot)
      .select(col("_stratum"),
        round(col("_tot") * pow(col("_n"), lit(alpha)) / (col("_zsum") * col("_n")), 6)
          .as("_w")))
    val thr = floor((col("_w") - floor(col("_w"))) * lit((1L << 60).toDouble))
    val nCopies = floor(col("_w")).cast("long") +
      when(md5Long(key.cast("string")) < thr, 1L).otherwise(0L)
    df.join(rates, stratum === col("_stratum"))
      .withColumn("_nc", nCopies)
      .withColumn("copy_idx",
        explode(when(col("_nc") >= 1, sequence(lit(1L), col("_nc")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("_stratum", "_w", "_nc")
  }

  /** Near-duplicate decontamination — the third tier: drop corpus
    * documents whose shingle Jaccard with ANY benchmark document is ≥
    * `threshold` (catches paraphrase-light contamination that the
    * exact tier misses and that shares no single 13-gram). Rides the
    * full MinHash+LSH machinery ([[FuzzyDedup.minhashNearDups]]):
    * benchmark docs join the corpus under negated ids, bucketed
    * banding finds cross-side candidates without any all-pairs stage,
    * and only verified pairs with one side negative mark corpus docs.
    * Scale is the q24 shape; the benchmark adds |benchmark| rows. */
  def nearDupDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                           threshold: Double = 0.8,
                           idCol: String = "doc_id",
                           corpusText: String = "text",
                           benchmarkText: String = "text"): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("doc_id"),
      col(corpusText).as("text"))
    // benchmark ids remapped to the negative space: the self-join
    // machinery then distinguishes sides for free, and doc_a < doc_b
    // puts the benchmark side of every cross pair in doc_a
    val b = benchmark.select((-col(idCol).cast("long") - 1).as("doc_id"),
      col(benchmarkText).as("text"))
    val pairs = FuzzyDedup.minhashNearDups(c.unionByName(b), threshold = threshold)
    val bad = pairs.filter(col("doc_a") < 0 && col("doc_b") >= 0)
      .select(col("doc_b").as("_bad")).distinct()
    corpus.join(bad, col(idCol) === col("_bad"), "left_anti")
  }

  /** N-gram-overlap decontamination: drop corpus documents sharing
    * ANY token `n`-gram with the benchmark set — the aggressive tier
    * used for LLM eval hygiene (a doc quoting 13 consecutive tokens
    * of an eval item is contaminated even if the rest differs), vs
    * [[decontaminate]]'s whole-document exact tier.
    *
    * Scale shape: the benchmark's n-gram set is distinct-reduced and
    * broadcast (eval sets are small); the corpus is shingled once and
    * semi-joined against it with NO corpus shuffle — only the matched
    * doc ids (rare) travel to the final anti-join. The join is on the
    * n-gram STRINGS: measured ~20% faster than md5-hashing both sides
    * (shingle construction dominates; the join's internal hash is far
    * cheaper than md5) and exactly the oracle's semantics. If the
    * benchmark is ever large enough that broadcast size matters,
    * hash both sides to int64 first (~6× smaller). Docs shorter than
    * `n` tokens have no n-grams and are always kept. */
  def ngramDecontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
                         corpusText: String = "text",
                         benchmarkText: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashFunctions.shingles
    val bfp = broadcast(benchmark
      .select(explode(shingles(col(benchmarkText), n)).as("_bs")).distinct())
    // widen before the 13-gram explode: the corpus-side shingle HOF is
    // the dominant CPU and pipelines onto the scan (Fanout scaladoc)
    val contaminated = Fanout
      .widen(corpus.select(col(idCol), col(corpusText)), col(idCol))
      .select(col(idCol), explode(shingles(col(corpusText), n)).as("_s"))
      .join(bfp, col("_s") === col("_bs"), "left_semi")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** The standing 13-gram inverted index — (doc, gram) distinct rows,
    * the decontamination sibling of FuzzyDedup.bandIndex: built once
    * over the corpus, probed by every benchmark update, so an eval
    * refresh costs index-probe, not corpus-re-shingle. Grams are kept
    * as RAW strings so the contract stays exactly [[ngramDecontaminate]]'s
    * string equality (a 100 TB deployment would md5 them — both sides
    * hash identically so semantics survive, at a measurable-not-zero
    * collision over-drop; this engine keeps the exact form and lets
    * the oracle hold it to q67's letter).
    *
    * Scale shape: one shingle explode + distinct; at 100 TB this is
    * the table to bucket-write by gram (the probe below becomes a
    * co-located join).
    *
    * Lifecycle decision (this index deliberately does NOT get the
    * bucketed-table + registered-append treatment the band index —
    * q481/q482 — and the vector index — q479/q480 — got): those
    * indexes are probed per arriving CORPUS batch on a corpus-sized
    * equi-join key, so the probe join shuffles unless the index is
    * pre-hashed — bucket layout and in-place appends are load-bearing
    * there. This index is probed per new EVAL SET, and the probe side
    * (the benchmark delta's grams) BROADCASTS — the index side never
    * shuffles regardless of physical layout, so bucketing buys the
    * serve nothing while benchmarks fit a broadcast (they do by
    * orders of magnitude: eval sets are MBs, corpora are TBs). Corpus
    * growth appends gram rows that are per-document independent (the
    * same statelessness that makes band appends associative), i.e.
    * plain parquet appends with no co-location requirement and no
    * compaction trigger beyond ordinary small-file hygiene
    * ([[graft.operators.Layout.compactionPlan]]). Only if a benchmark
    * ever outgrew broadcast would the gram-keyed co-located join —
    * and with it the bucketed standing table — become the right form
    * (previous paragraph). */
  def ngramIndex(corpus: DataFrame, n: Int = 13,
                 corpusText: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashFunctions.shingles
    // widen before the 13-gram explode (same rationale as
    // [[ngramDecontaminate]]'s corpus side)
    Fanout.widen(corpus.select(col(idCol), col(corpusText)), col(idCol))
      .select(col(idCol),
        explode(shingles(col(corpusText), n)).as("gram")).distinct()
  }

  /** Per-update decontamination — the benchmark grows (a new eval set
    * ships), and ONLY the delta is paid for: the new benchmark's
    * n-grams broadcast against the STANDING [[ngramIndex]] to find
    * newly-hit docs, which are subtracted from the standing survivor
    * set. Contamination is monotone in the benchmark
    * (hit(A∪B) = hit(A) ∪ hit(B)), so the result provably equals the
    * full [[ngramDecontaminate]] rebuild against old ∪ new — the
    * full-rebuild replay IS the oracle (the q324/q325 posture, third
    * standing-product family).
    *
    * Scale shape: the broadcast side is delta-sized (the new bench's
    * distinct grams), the index scan is column-pruned ints+grams, and
    * the corpus text is never re-read. */
  def incrementalDecontaminate(survivors: DataFrame, gramIndex: DataFrame,
                               newBench: DataFrame, n: Int = 13,
                               benchmarkText: String = "text",
                               idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashFunctions.shingles
    val newGrams = broadcast(newBench
      .select(explode(shingles(col(benchmarkText), n)).as("_bs")).distinct())
    val newlyHit = gramIndex
      .join(newGrams, col("gram") === col("_bs"), "left_semi")
      .select(idCol).distinct()
    survivors.join(newlyHit, Seq(idCol), "left_anti")
  }

  /** Systematic (every k-th) sampling over an explicit frame order:
    * rank rows by `(orderCol, idCol)` and keep ranks ≡ offset
    * (mod k) — the survey-methodology classic that implicitly
    * stratifies over whatever the sort key encodes (sorted by size →
    * the sample spans the size distribution evenly; sorted by a
    * Z-value → it spans the layout). Where [[hashSample]] gives
    * independence, systematic gives COVERAGE of the ordered frame —
    * complementary guarantees.
    *
    * Scale shape: ranking needs a total order — ride a sort the
    * layout already has (the Z-order write, a range-partitioned
    * key), in which case the rank is per-partition arithmetic on
    * top of existing order; a bare unsorted corpus pays one global
    * sort, same as any order-dependent frame method. */
  def systematicSample(df: DataFrame, orderCol: Column, idCol: Column,
                       k: Int, offset: Int = 0): DataFrame = {
    require(k >= 1 && offset >= 0 && offset < k)
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_rn",
        row_number().over(Window.orderBy(orderCol, idCol)).cast("long"))
      .filter((col("_rn") - 1) % k === offset)
      .drop("_rn")
  }

  /** Purged temporal train/val split with an embargo gap: rows before
    * the cutoff instant train, rows inside `(cutoff, cutoff+embargo]`
    * are PURGED (labeled `embargo`, excluded from both sides), rows
    * after validate. The embargo is what [[trainValSplit]]'s hash
    * split cannot give a time-series model: features computed over
    * trailing windows (EWMA, rolling counts, session aggregates)
    * near the boundary would otherwise leak label-period information
    * into training — the look-ahead bias that makes backtests lie.
    *
    * The cutoff is the `1 - valNum/valDen` point of the observed TIME
    * RANGE, in pure int64 arithmetic (`mn + ((mx-mn)*(den-num)) div
    * den`) — engine-exact, no float, no order statistics. Scale
    * shape: one map-side-combinable min/max agg produces a 1-row
    * bound relation that broadcasts onto a scan-speed projection; the
    * corpus itself never shuffles. (A count-quantile cutoff would
    * need a global sort or sketch; a time-range cutoff is the one a
    * production backtest actually pins — "train through March,
    * embargo a day, validate April".)
    *
    * An undated row (NULL `tsCol`) gets a NULL `split` — it belongs
    * to no fold. Letting `otherwise` claim it would silently drop
    * undated rows into VALIDATION, the exact leak-adjacent fold a
    * purged split exists to protect. */
  def purgedTemporalSplit(df: DataFrame, tsCol: Column,
                          valNum: Int, valDen: Int,
                          embargo: Long): DataFrame = {
    require(valDen > 0 && valNum >= 0 && valNum <= valDen && embargo >= 0)
    val bounds = broadcast(df.agg(
      min(tsCol).cast("long").as("_mn"), max(tsCol).cast("long").as("_mx")))
    val cut = expr(s"_mn + ((_mx - _mn) * ${valDen - valNum}L) div $valDen")
    df.crossJoin(bounds)
      .withColumn("split",
        when(tsCol.isNull, lit(null).cast("string"))
          .when(tsCol <= cut, "train")
          .when(tsCol <= cut + embargo, "embargo")
          .otherwise("val"))
      .drop("_mn", "_mx")
  }

  /** Neyman allocation: how a fixed sampling budget SHOULD be split
    * across strata — n_h ∝ N_h·σ_h, the design that minimizes the
    * estimator variance (proportional allocation over-samples large
    * HOMOGENEOUS strata; Neyman spends budget where size × spread
    * is). This operator COMPUTES the design the other samplers here
    * consume (feed the resulting per-stratum fractions to
    * [[stratifiedSample]]).
    *
    * Exactness: σ_h comes from exact int64/decimal moments of the
    * quantized metric; the weight N_h·σ_h quantizes ×10⁶ to int64
    * and the budget splits by EXACT integer proration —
    * budget·q_h div Σq, with the leftover units going to the largest
    * remainders (stratum-name tiebreak), the q149 penny-assignment
    * principle — so Σ alloc_n = budget exactly, on any engine.
    * Constant strata (σ = 0) get weight 0 — Neyman assigns them
    * nothing beyond remainder spill (sample 1 row separately if the
    * mean itself is wanted).
    *
    * Scale shape: one map-side-combined stratum agg, then
    * strata-row arithmetic with two windows over the bounded strata
    * relation. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
                       valueCol: Column, budget: Long,
                       scale: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1)
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val perS = df.filter(col(stratumCol).isNotNull && valueCol.isNotNull)
      .select(col(stratumCol).as("_g"), q.as("_q"))
      .groupBy("_g")
      .agg(count(lit(1)).as("n_rows"), sum("_q").as("_s"),
        sum(col("_q").cast("decimal(38,0)") * col("_q")).as("_qq"))
    val nD = col("n_rows").cast("double")
    val sd = sqrt((col("_qq").cast("double") -
      col("_s").cast("double") * (col("_s").cast("double") / nD)) / nD)
    val weighted = perS
      .withColumn("_w", floor(nD * sd * 1e6 + lit(0.5)).cast("long"))
    val tot = broadcast(weighted.agg(sum("_w").as("_tw")))
    // the w·budget product runs in decimal: w ≈ n·σ·10⁶ can reach
    // ~10¹⁵ and an int64 product would overflow past sf1
    val base = weighted.crossJoin(tot)
      .withColumn("_alloc",
        expr(s"(cast(_w as decimal(38,0)) * ${budget}L) div _tw"))
      .withColumn("_rem",
        expr(s"(cast(_w as decimal(38,0)) * ${budget}L) % _tw"))
    // leftover units to the largest remainders, stratum tiebreak —
    // exact integer proration (Σ alloc = budget by construction)
    val wRem = Window.orderBy(col("_rem").desc, col("_g"))
    val spill = broadcast(base.agg(
      (lit(budget) - sum("_alloc")).as("_spill")))
    base.crossJoin(spill)
      .withColumn("_rk", row_number().over(wRem))
      .select(col("_g").as(stratumCol), col("n_rows"),
        round(sd / scale, 6).as("sd"),
        round(col("_w").cast("double") / col("_tw"), 6).as("share"),
        (col("_alloc") + when(col("_rk") <= col("_spill"), 1L)
          .otherwise(0L)).as("alloc_n"))
  }

  /** Expected calibration error over EQUAL-MASS bins: scores ranked
    * (score, id) and cut into `bins` equal-count bins by integer
    * division — the adaptive-binning ECE that avoids equal-width
    * bins' empty-cell problem when scores bunch (the usual case
    * after a sigmoid). Complements [[Curation.calibrationReport]]
    * (equal width) and [[Curation.brierDecomposition]].
    *
    * Determinism: the rank is a total order; bin = (rank−1)·bins
    * div n is integer; per-bin sums of the ×10⁶-exact score are
    * int64 — every reported number divides identical operands.
    *
    * Scale shape: one global sort (the price of equal-mass cuts —
    * the same cost class as [[graft.operators.Analytics]]'s RFM
    * ntile over a dimension; run on scored UNITS, not raw events);
    * then one map-side-combinable bin agg. */
  def equalMassEce(scored: DataFrame, scoreCol: String, labelCol: String,
                   idCol: Column, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2)
    val s6 = floor(col(scoreCol) * 1e6 + lit(0.5)).cast("long")
    val base = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(s6.as("_s"), col(labelCol).cast("long").as("_y"),
        idCol.as("_id"))
      .withColumn("_rn", row_number().over(
        Window.orderBy(col("_s"), col("_id"))))
    val n = broadcast(base.agg(count(lit(1)).as("_n")))
    base.crossJoin(n)
      .withColumn("bin", expr(s"((_rn - 1) * ${bins}L) div _n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        sum("_s").as("_ss"), max("_n").as("_N"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_ss").cast("double") / col("n") / 1e6, 6)
          .as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("_ss").cast("double") / col("n") / 1e6 -
            col("n_pos").cast("double") / col("n")) *
          (col("n").cast("double") / col("_N")), 6).as("ece_term"))
  }

  /** Span-level contamination report: for every corpus doc sharing a
    * token n-gram with the benchmark, WHERE the hits sit — hit
    * count, first/last hit token position (1-based), and the hit
    * fraction of its n-gram positions. The audit upgrade of
    * [[ngramDecontaminate]]'s binary drop: "one quoted sentence at
    * position 847" and "40% of the doc is benchmark text" both fail
    * the gate, but a curator treats them differently (trim the span
    * vs drop the doc).
    *
    * Positions come from the UNDEDUPLICATED shingle array
    * ([[graft.functions.HashFunctions.shinglesAll]]), so a gram
    * repeated at several positions counts each one. Clean docs emit
    * no row (the report is about contaminated docs).
    *
    * Returns (doc_id, n_grams, n_hits, first_hit_pos, last_hit_pos,
    * hit_frac).
    *
    * Scale shape: [[ngramDecontaminate]]'s exact posture — benchmark
    * grams distinct-reduced and broadcast, corpus shingled once with
    * NO corpus shuffle before the hit filter; only hit positions
    * (rare) reach the per-doc agg; totals ride a scan projection. */
  def contaminationSpans(corpus: DataFrame, benchmark: DataFrame,
                         n: Int = 13, corpusText: String = "text",
                         benchmarkText: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashFunctions.{shingles, shinglesAll}
    val bfp = broadcast(benchmark
      .select(explode(shingles(col(benchmarkText), n)).as("_bs"))
      .distinct())
    // widen once, shared by both consumers: the undeduplicated
    // 13-gram explode and the total-gram projection are the CPU of
    // this operator and pipeline onto the scan (Fanout scaladoc)
    val wideCorpus = Fanout
      .widen(corpus.select(col(idCol), col(corpusText)), col(idCol))
    val pos = wideCorpus.select(col(idCol),
      posexplode(shinglesAll(col(corpusText), n)).as(Seq("_p", "_s")))
    val hits = pos.join(bfp, col("_s") === col("_bs"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        (min("_p") + 1).cast("long").as("first_hit_pos"),
        (max("_p") + 1).cast("long").as("last_hit_pos"))
    val totals = wideCorpus.select(col(idCol),
      size(shinglesAll(col(corpusText), n)).cast("long").as("n_grams"))
    hits.join(totals, Seq(idCol))
      .select(col(idCol), col("n_grams"), col("n_hits"),
        col("first_hit_pos"), col("last_hit_pos"),
        round(col("n_hits").cast("double") /
          col("n_grams").cast("double"), 6).as("hit_frac"))
  }

  /** Rendezvous (highest-random-weight) sharding with a resharding
    * stability audit: each row lands on the shard whose
    * md5(row, shard) is highest — the assignment scheme whose
    * defining property is MINIMAL MOVEMENT on topology change
    * (growing nOld → nNew shards moves only ~1/nNew of rows, and
    * every mover lands on a NEW shard; modulo hashing reshuffles
    * ~everything). Computes both assignments and reports, per new
    * shard, the row count and how many arrived by moving — the
    * audit you run before a resharding migration.
    *
    * Determinism: md5Long weights (engine-replayable), ties broken
    * by shard index under a (weight desc, shard) total order —
    * though 60-bit weights make ties unobservable, the order is
    * still total by construction.
    *
    * Returns (shard, n, n_moved, moved_frac) — nNew rows.
    *
    * Scale shape: a constant ×nNew fan-out over ids, two
    * row_number windows PARTITIONED BY id (nNew-row groups — never
    * a global sort), one id-keyed join of the two 1-row-per-id
    * assignments, one nNew-row agg. */
  def rendezvousShard(df: DataFrame, idCol: Column,
                      nOld: Int, nNew: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nOld >= 2 && nNew > nOld)
    val base = df.filter(idCol.isNotNull).select(idCol.as("_id"))
    def assign(n: Int, out: String): DataFrame = {
      val w = Window.partitionBy(col("_id"))
        .orderBy(col("_h").desc, col("_s"))
      base.select(col("_id"),
          explode(array((0 until n).map(lit): _*)).as("_s"))
        .withColumn("_h",
          md5Long(concat_ws("_", lit("hrw"), col("_id"), col("_s"))))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("_id"), col("_s").as(out))
    }
    val joined = assign(nNew, "shard").join(assign(nOld, "_old"), Seq("_id"))
    joined.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("shard") =!= col("_old"), 1L).otherwise(0L))
          .as("n_moved"))
      .select(col("shard").cast("long").as("shard"), col("n"),
        col("n_moved"),
        round(col("n_moved").cast("double") / col("n").cast("double"), 6)
          .as("moved_frac"))
  }
}
