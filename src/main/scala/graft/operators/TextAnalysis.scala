package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-corpus text analysis (SURVEY.md §2.11 extension surface):
  * token statistics, quality scoring, language ID, fingerprints.
  *
  * Input contract: a DataFrame with (`idCol`: long, `textCol`:
  * string). All outputs are per-row projections — no shuffle, scan
  * parallel at any scale.
  */
object TextAnalysis {

  /** Token statistics: count, distinct count, alnum char mass,
    * BPE-ish subword count. */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    // counts cast to long: the DuckDB oracle's len() yields BIGINT
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
      alnumChars(toks).cast("long").as("alnum_chars"),
      bpeishTokenCount(col(textCol)).cast("long").as("n_bpeish"))
  }

  /** Quality signals: length, punctuation ratio, stopword ratio, mean
    * token length, and a blended [0,1]-ish score. Ratios are rounded
    * to 6 decimals for cross-engine comparability. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / nullifZero(nChar)
    val stopRatio = stopwordCount(toks, StopEn).cast("double") / nullifZero(nTok)
    val avgTokLen = alnumChars(toks).cast("double") / nullifZero(nTok)
    // blended heuristic: long-enough docs with some stopwords and
    // moderate punctuation score high (weights arbitrary but fixed)
    val score = least(nChar / lit(500.0), lit(1.0)) * lit(0.4) +
      least(coalesce(stopRatio, lit(0.0)) * lit(5.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - least(coalesce(punctRatio, lit(0.0)) * lit(10.0), lit(1.0))) * lit(0.2)
    docs.select(
      col(idCol),
      length(text).cast("long").as("n_chars"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(avgTokLen, 6).as("avg_token_len"),
      round(score, 6).as("quality"))
  }

  /** Stopword-heuristic language identification. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol), langId(col(textCol)).as("predicted_lang"))

  /** Content fingerprints (md5 + 60-bit key) of normalized text. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      fingerprint(col(textCol)).as("fp_md5"),
      fingerprint64(col(textCol)).as("fp64"))

  /** TF-IDF (SURVEY.md §2.11): tf = term frequency within the doc;
    * idf = ln((N+1)/(df+1)).
    *
    * Scale shape: ONE tokenize + (doc, term) aggregation, then doc
    * lengths and document frequencies as window aggregations over
    * that same relation — two shuffles of the (already reduced) tf
    * table, zero persists, zero extra scans of the corpus. (The
    * round-1 shape cached tf and re-joined two aggregations of it —
    * same shuffle count, but it pinned the vocabulary-sized relation
    * in executor memory and leaked it past the operator's return.) */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    // corpus size as a lazy broadcast scalar — no eager driver job
    val nDf = broadcast(docs.agg(
      countDistinct(col(idCol)).cast("double").as("_n")))
    tf
      .withColumn("doc_len", sum("tf").over(wDoc))
      .withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(nDf)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round((col("tf").cast("double") / col("doc_len")) *
          log((col("_n") + 1.0) / (col("df").cast("double") + 1.0)), 6)
          .as("tfidf"))
  }

  /** Context-window chunking: split each document into overlapping
    * token-window chunks — the standard pre-tokenization step for
    * fixed-context training. Chunk i starts at token
    * 1 + i·(chunkTokens − overlap); the final chunk may be short.
    * Pure per-row expressions (sequence → posexplode → slice):
    * scan-speed, no shuffle, chunk count bounded by
    * ⌈tokens/stride⌉. Empty docs emit one empty chunk (so no
    * document silently disappears between pipeline stages). */
  def chunkDocuments(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", chunkTokens: Int = 128,
                     overlap: Int = 16): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), toks.as("_toks"))
      .select(col("doc_id"),
        posexplode(sequence(lit(1), greatest(size(col("_toks")), lit(1)), lit(stride)))
          .as(Seq("chunk_id", "_start")),
        col("_toks"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(slice(col("_toks"), col("_start"), lit(chunkTokens)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("_toks"), col("_start"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Unigram language-model scoring: each document's mean log
    * probability of its tokens under the corpus's own unigram
    * distribution — the perplexity-flavored quality signal (documents
    * full of corpus-typical words score high; gibberish and
    * vocabulary-anomalous text score low). A cheap stand-in for the
    * "LM quality filter" stage of training-data pipelines, entirely
    * relational.
    *
    * Scale shape: ONE tokenize/explode; the vocabulary aggregation is
    * map-side combinable; per-token probabilities arrive via a
    * broadcast of the (term, count, total) table (bounded by
    * vocabulary size, not corpus size); the final per-doc average is
    * one reduced shuffle. Docs with zero tokens are absent (no
    * distribution to score against). */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("tc"))
    val total = vocab.agg(sum("tc").cast("double").as("_tot"))
    toks.join(broadcast(vocab.crossJoin(total)), Seq("term"))
      .groupBy("doc_id").agg(
        round(avg(log(col("tc") / col("_tot"))), 6).as("avg_logp"),
        count(lit(1)).cast("long").as("n_tokens"))
  }

  /** Inverted-index build: one row per term with document frequency,
    * collection frequency, and the top-`topPostings` posting list
    * serialized `doc:tf,...` (tf desc, doc asc — deterministic) —
    * the retrieval artifact behind [[bm25]], materialized. Capping
    * postings bounds every row regardless of how stopword-like a
    * term is; full postings are the uncapped `tf` relation itself.
    *
    * Scale shape: one (term, doc) shuffle for tf, map-side-combinable
    * term stats, and a term-partitioned rank to cut postings BEFORE
    * any list is materialized — the serialized list is
    * `topPostings`-bounded, never df-sized. (The bounded-heap
    * [[graft.plans.TopKPerKey]] operator is the exchange-eliding
    * variant of the same cut.) */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    topPostings: Int = 5): DataFrame = {
    require(topPostings >= 1)
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
    val post = tf.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topPostings)
      .withColumn("_s", concat(col("doc_id"), lit(":"), col("tf")))
      .groupBy("term")
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(_rn, _s))), x -> x._s), ',')").as("postings"))
    stats.join(post, Seq("term"))
  }

  /** Bigram language-model score per document: add-k-smoothed
    * conditional log-probabilities averaged over the doc's
    * consecutive token pairs —
    * `avg(ln((c(w1,w2) + k) / (c(w1·) + k·V)))`, with `c(w1·)` the
    * bigram-prefix count, `V` the corpus vocabulary, both estimated
    * from the corpus itself. The order-aware upgrade of
    * [[unigramLogProb]]'s fluency gate: repetitive or shuffled text
    * scores low even when its unigram mix looks natural. Returns
    * (doc_id, n_bigrams, lm_score rounded 6); docs with < 2 tokens
    * are absent (no bigram to score).
    *
    * Scale shape: one tokenize + one per-doc window (`lead` over
    * token position — the same partitioned sort chunking pays), then
    * map-side-combinable (w1,w2) / (w1) counts; scoring joins the
    * bigram stream against those count tables ON THEIR OWN KEYS
    * (co-partitioned, vocabulary²-bounded — NOT broadcast, unlike
    * the unigram table, because bigram vocabularies outgrow driver
    * memory at corpus scale), and the per-doc average is one reduced
    * shuffle. */
  def bigramLogProb(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol)))).toDF("doc_id", "pos", "term")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val bi = toks.select(col("doc_id"), col("term").as("w1"),
        lead("term", 1).over(w).as("w2"))
      .filter(col("w2").isNotNull)
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("_c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("_c1"))
    val v = broadcast(toks.agg(countDistinct("term").cast("double").as("_v")))
    bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1")).crossJoin(v)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("_c12") + lit(k)) /
          (col("_c1") + lit(k) * col("_v")))), 6).as("lm_score"))
  }

  /** BM25 relevance of every document against a fixed query-term
    * set — the classic retrieval scorer (Robertson/Okapi, in the
    * Lucene `idf = ln(1 + (N − df + ½)/(df + ½))` form), the standard
    * lexical arm of corpus search and RAG-style retrieval next to the
    * embedding operators (`Similarity`).
    *
    * Scale shape: the exploded token stream is filtered to the query
    * terms BEFORE the (doc, term) aggregation, so the shuffle carries
    * only hit rows (|queryTerms| ≪ vocabulary — at 100 TB this is the
    * difference between shuffling the corpus's token stream and
    * shuffling the hit list). Per-term document frequencies reduce to
    * ≤ |queryTerms| rows and broadcast back; corpus size and average
    * document length ride one broadcast scalar row. Document lengths
    * are a pure projection joined to hit docs only. Ranking uses the
    * ROUNDED score with a doc_id tiebreak, so the top-k boundary is
    * deterministic and engine-portable; the global top-k plans as
    * TakeOrderedAndProject, never a full sort. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           idCol: String = "doc_id", textCol: String = "text",
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty && k1 > 0 && b >= 0 && b <= 1 && topK >= 1)
    val lens = docs.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("double").as("dl"))
    // one broadcast row: corpus size + mean document length
    val stats = broadcast(lens.agg(
      count(lit(1)).cast("double").as("_n"), avg("dl").as("_avgdl")))
    val hits = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfs = broadcast(hits.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df")))
    val idf = log(lit(1.0) + (col("_n") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("_avgdl"))
    hits
      .join(dfs, "term")
      .join(lens, "doc_id")
      .crossJoin(stats)
      .withColumn("_s", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy("doc_id").agg(
        round(sum(col("_s")), 6).as("score"),
        count(lit(1)).cast("long").as("n_hit_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of two ranked shortlists — the standard
    * hybrid-retrieval combiner (Cormack et al. 2009; every
    * lexical+vector search stack's default): each arm contributes
    * 1/(k + rank) per id, missing-from-one-arm ids keep the other
    * arm's contribution, and the fused order is by the summed score.
    * Rank positions are derived HERE from each arm's (score, id) —
    * ties to the lower id — so callers pass scored shortlists, not
    * pre-ranked ones, and both arms use one deterministic contract.
    *
    * Exactness: each term is the INTEGER division 10¹² div (k+rank)
    * — no float in the sum, so the fused order and every tie are
    * bit-identical on any engine (the reported `rrf` is the exact
    * integer divided by 10¹², rounded 6).
    *
    * Scale shape: inputs are per-key ranked SHORTLISTS (topK-bounded
    * by their producers — bm25's TakeOrderedAndProject, ANN's top-k),
    * so every window and the full-outer join here run on
    * shortlist-cardinality relations; corpus size never appears. With
    * empty `keyCols` the global window is bounded by the two
    * shortlists (the documented bounded-window class). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String = "doc_id",
              scoreCol: String = "score", keyCols: Seq[String] = Nil,
              kRrf: Int = 60, topK: Int = 20): DataFrame = {
    require(kRrf >= 1 && topK >= 1)
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    def ranked(df: DataFrame, rk: String): DataFrame =
      df.select(keyCols.map(col) :+ col(idCol) :+ col(scoreCol).as("_s"): _*)
        .withColumn(rk, row_number().over(
          Window.partitionBy(keys: _*)
            .orderBy(col("_s").desc, col(idCol))).cast("long"))
        .drop("_s")
    val ja = ranked(a, "rank_a")
    val jb = ranked(b, "rank_b")
    val on = keyCols :+ idCol
    val fused = ja.join(jb, on, "full_outer")
      .withColumn("_rrfq",
        coalesce(expr(s"1000000000000 div (${kRrf}L + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000000000 div (${kRrf}L + rank_b)"), lit(0L)))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(keys: _*)
          .orderBy(col("_rrfq").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= topK)
      .select(on.map(col) ++ Seq(col("rank_a"), col("rank_b"),
        round(col("_rrfq").cast("double") / 1e12, 6).as("rrf"),
        col("rank")): _*)
  }

  /** Cross-document repeated n-gram mass — the substring-level dedup
    * signal (the word-gram approximation of suffix-array exact
    * substring dedup à la "Deduplicating Training Data Makes Language
    * Models Better"): for each document, how many of its n-gram
    * positions are covered by a gram that also occurs in ANOTHER
    * document. Sits between whole-doc dedup (exact/MinHash) and
    * nothing: boilerplate headers, license blocks, and templated spans
    * show up here long before two documents are near-duplicates.
    *
    * Scale shape: grams are built positionally by the zip_with-slice
    * construction (one tokenize per doc, no lambda re-evaluation) and
    * immediately hashed to 60-bit md5 longs, so the ONE (doc, gram)
    * shuffle carries fixed-width ints, never gram strings. Cross-doc
    * occurrence is a window over the gram hash partition of the
    * already-reduced (doc, gram, cnt) relation — linear in corpus
    * grams, no self-join, no candidate explosion. Docs shorter than n
    * tokens survive with zero mass (quality gates must see every
    * doc). */
  def crossDocGramStats(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 5): DataFrame = {
    require(n >= 1)
    val toks = tokens(col(textCol))
    val nSh = greatest(size(toks) - (n - 1), lit(0))
    val joined = (2 to n).foldLeft(slice(toks, lit(1), nSh)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), nSh), (a, b) => concat(a, lit(" "), b))
    }
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(joined).as("gram"))
      .select(col("doc_id"),
        graft.functions.HashFunctions.md5Long(col("gram")).as("gh"))
      .groupBy("doc_id", "gh").agg(count(lit(1)).as("cnt"))
    val wGram = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    val stats = perDoc
      .withColumn("ndocs", count(lit(1)).over(wGram))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_grams"),
        sum(when(col("ndocs") >= 2, col("cnt")).otherwise(0L)).as("n_shared_grams"))
    docs.select(col(idCol).as("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_shared_grams") / col("n_grams"), 6))
          .as("shared_frac"))
  }

  /** Vocabulary coverage: the top-K corpus terms with their cumulative
    * token-mass coverage — the table a tokenizer/vocab build reads
    * ("how many terms cover 95% of the corpus"). Ordering is count
    * desc with a term tiebreak, so rank k is deterministic on every
    * engine.
    *
    * Scale shape: one tokenize/explode into a map-side-combinable
    * term count (the only corpus-sized stage), a 1-row broadcast
    * total, then a running sum over the VOCABULARY-sized relation —
    * the single unpartitioned window is bounded by |vocab|, not the
    * corpus (same dispensation as Packing's block table; at 10⁸+
    * vocab terms, pre-truncate with a count floor). */
  def vocabCoverage(docs: DataFrame, topK: Int = 1000,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(topK >= 1)
    val counts = docs
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = broadcast(counts.agg(sum("cnt").cast("double").as("_tot")))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("cnt").desc, col("term"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    counts.crossJoin(total)
      .select(col("term"), col("cnt"),
        row_number().over(w).cast("long").as("rank"),
        round(sum("cnt").over(w) / col("_tot"), 6).as("coverage"))
      .filter(col("rank") <= topK)
  }

  /** Repetition signals for corpus quality filtering (the
    * Gopher-rules shape: repetitious documents are low-quality
    * machine-generated or boilerplate text and get filtered before
    * training):
    *
    *  - `dup_token_frac` — fraction of tokens that are repeats of an
    *    earlier token (1-gram repetition);
    *  - `top_bigram` / `top_bigram_frac` — the most frequent word
    *    2-gram (ties broken to the lexicographically smallest) and the
    *    fraction of alnum characters its occurrences cover;
    *  - `dup_trigram_frac` — fraction of trigram character mass in
    *    trigrams occurring more than once.
    *
    * Scale shape: 1-gram stats are pure projections; bigram/trigram
    * stats are ONE explode each → map-side-combinable (doc, gram)
    * count → per-doc aggregation. Both shuffles carry (doc, gram)
    * counts, already reduced; nothing is persisted and the corpus is
    * scanned once per gram family. The top-bigram argmax is a
    * `max_by`-style partial aggregate, not a sort. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("_toks"))
    val nt = size(col("_toks"))
    val uni = base.select(
      col("doc_id"),
      nt.cast("long").as("n_tokens"),
      round((nt - size(array_distinct(col("_toks")))).cast("double") /
        nullifZero(nt.cast("double")), 6).as("_dup_tok"),
      alnumChars(col("_toks")).cast("double").as("_alnum"))
    // bigrams/trigrams as pure array expressions (no window shuffle to
    // build them); gram char mass excludes the joining spaces
    val bigrams = zip_with(
      slice(col("_toks"), lit(1), greatest(nt - 1, lit(0))),
      slice(col("_toks"), lit(2), greatest(nt - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val trigrams = when(nt >= 3,
      transform(sequence(lit(1), nt - 2), i =>
        concat_ws(" ", element_at(col("_toks"), i),
          element_at(col("_toks"), i + 1),
          element_at(col("_toks"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val bigCnt = base.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
    // argmax with deterministic tie-break (max count, then MIN bigram
    // — min_by can't express "min string among max counts" in one
    // aggregate, so: max count per doc, filter to the tied rows, min)
    val maxCnt = bigCnt.groupBy("doc_id").agg(max("cnt").as("_mx"))
    val topBg = bigCnt.join(maxCnt, "doc_id")
      .filter(col("cnt") === col("_mx"))
      .groupBy("doc_id").agg(min("bg").as("top_bigram"), max("cnt").as("_top_cnt"))
    val triAgg = base.select(col("doc_id"), explode(trigrams).as("tg"))
      .groupBy("doc_id", "tg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum(when(col("cnt") > 1, col("cnt") * (length(col("tg")) - 2))
          .otherwise(lit(0L))).as("_dup_chars"),
        sum(col("cnt") * (length(col("tg")) - 2)).as("_tot_chars"))
    uni
      .join(topBg, Seq("doc_id"), "left")
      .join(triAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("_dup_tok"), lit(0.0)).as("dup_token_frac"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        round(coalesce(
          (col("_top_cnt") * (length(col("top_bigram")) - 1)).cast("double") /
            nullifZero(col("_alnum")), lit(0.0)), 6).as("top_bigram_frac"),
        round(coalesce(col("_dup_chars").cast("double") /
          nullifZero(col("_tot_chars").cast("double")), lit(0.0)), 6)
          .as("dup_trigram_frac"))
  }

  /** Token-distribution Shannon entropy per document — the
    * gibberish/degenerate-text detector that complements
    * [[repetitionSignals]]: keyboard-mash and single-phrase spam
    * score near 0 bits; natural prose scores near log(distinct
    * terms). One (doc, term) count aggregation + a doc-partitioned
    * window — a single reduced shuffle, no persist. */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val p = col("tf").cast("double") / col("n")
    tf.withColumn("n", sum("tf").over(w).cast("double"))
      .groupBy("doc_id").agg(
        round(-sum(p * log(p)), 6).as("token_entropy"),
        max(col("n")).cast("long").as("n_tokens"))
  }

  /** The C4-style cleanup gate stack — language + quality +
    * token-repetition + exact-dedup survivor — fused into ONE corpus
    * scan and ONE shuffle. The composable operators ([[qualityScore]],
    * [[languageId]], [[repetitionSignals]], fingerprint dedup) each
    * scan the input; joining their outputs would re-read a 100 TB
    * corpus four times. Every gate here except the survivor is a pure
    * expression, so they ride a single projection; the survivor is a
    * `min(doc_id) over (partition by fingerprint)` window — the one
    * (fully key-partitioned) shuffle. Formulas are identical to the
    * standalone operators (thresholds compare the same rounded
    * values), so the fused and composed forms select the same rows. */
  def cleanupGate(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", lang: String = "en",
                  minQuality: Double = 0.45,
                  maxDupTokenFrac: Double = 0.65): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / nullifZero(nChar)
    val stopRatio = stopwordCount(toks, StopEn).cast("double") / nullifZero(nTok)
    val quality = round(
      least(nChar / lit(500.0), lit(1.0)) * lit(0.4) +
        least(coalesce(stopRatio, lit(0.0)) * lit(5.0), lit(1.0)) * lit(0.4) +
        (lit(1.0) - least(coalesce(punctRatio, lit(0.0)) * lit(10.0), lit(1.0))) * lit(0.2), 6)
    val dupTok = coalesce(round((size(toks) - size(array_distinct(toks))).cast("double") /
      nullifZero(size(toks).cast("double")), 6), lit(0.0))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_fp")
    docs
      .select(col(idCol).as("doc_id"), quality.as("_q"), langId(text).as("_l"),
        dupTok.as("_d"), fingerprint64(text).as("_fp"))
      .withColumn("_survivor", min("doc_id").over(w))
      .filter(col("_l") === lang && col("_q") >= minQuality &&
        col("_d") <= maxDupTokenFrac && col("doc_id") === col("_survivor"))
      .select("doc_id")
  }

  /** Heuristic PII redaction: emails, phone-number-shaped digit runs,
    * and long bare digit runs replaced by typed placeholders. Pure
    * regexp projection (scan-speed); patterns restricted to explicit
    * character classes so Java and RE2 regex engines agree — the
    * redacted corpus, and the redaction counts, are oracle-verified.
    * A production pipeline swaps in its own pattern set; the operator
    * shape (ordered replace chain + per-category counts) stays. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"
  val LongNumRe = "[0-9]{6,}"

  def redactPii(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    val clean = regexp_replace(afterPhone, LongNumRe, "<NUM>")
    docs.select(
      col(idCol),
      clean.as("clean_text"),
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
  }

  /** C4-style cross-document duplicated-span removal (cf. the C4
    * cleanup's "discard any three-sentence span occurring more than
    * once"; reference has no dedup at all — LLM-pipeline extension,
    * SURVEY.md §2.11).
    *
    * Documents are cut into NON-overlapping `spanTokens`-token spans;
    * any span whose exact text occurs in ≥ `minDocs` distinct
    * documents is dropped from every document carrying it, and each
    * document is reassembled from its surviving spans in original
    * order. Boilerplate (headers, license blocks, navigation chrome)
    * disappears corpus-wide in one pass while unique prose survives.
    *
    * Scale shape: three key-bounded shuffles — (1) span rows keyed by
    * the 128-bit md5 of the span (fixed-width key: the span TEXT
    * never rides a shuffle twice), with map-side partial
    * count-distinct; (2) the anti-join of span rows against the
    * duplicated-hash set (hash-keyed, no cartesian anywhere); (3) one
    * groupBy document to reassemble. No window over the corpus, no
    * driver action, nothing proportional to corpus² — the exact
    * shape this runs at 100 TB, where the duplicated-hash side is a
    * tiny fraction of the span count.
    */
  def dropDuplicateSpans(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", spanTokens: Int = 16,
                         minDocs: Int = 2): DataFrame = {
    val spans = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      // sequence(0, n_chunks-1) is safe: n_chunks ≥ 1 after the filter
      .select(col(idCol),
        explode(expr(s"sequence(0, int((size(toks) + $spanTokens - 1) / $spanTokens) - 1)")).as("i"),
        col("toks"))
      .select(col(idCol), col("i"),
        array_join(expr(s"slice(toks, i * $spanTokens + 1, $spanTokens)"), " ").as("span"))
    val dupes = spans
      .groupBy(md5(col("span")).as("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    spans
      .join(dupes, md5(col("span")) === col("h"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("i"), col("span")))),
            x => x.getField("span")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }

  /** Per-token mutual-information contribution against a document
    * label (language, source, quality tier): for each token t with
    * ≥ 0.1% of total token mass, MI(t) = Σ_label p(t,l)·ln(p(t,l) /
    * (p(t)·p(l))). The classic χ²/MI feature-selection score — which
    * tokens are label-informative (stopwords → ~0, language-specific
    * tokens → high).
    *
    * Scale shape: one (token,label) shuffle with map-side combine,
    * then a token-partitioned window for the token marginal (no
    * second shuffle of the raw stream), and the label marginal + N
    * ride in via a ≤|labels|-row broadcast. Arithmetic shape is
    * mirrored literally in the oracle dual (cast order matters for
    * cross-engine FP identity at round-6).
    */
  def tokenLabelMI(docs: DataFrame, labelCol: String = "lang",
                   idCol: String = "doc_id", textCol: String = "text",
                   massDen: Long = 1000L): DataFrame = {
    val cells = docs
      .select(col(labelCol).as("label"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("token", "label").agg(count(lit(1)).as("c"))
    val labelTotals = broadcast(cells.groupBy("label")
      .agg(sum("c").as("cl"))
      .agg(collect_list(struct(col("label"), col("cl"))).as("ls"),
        sum(col("cl")).as("nn"))
      .select(explode(col("ls")).as("l"), col("nn"))
      .select(col("l.label").as("label"), col("l.cl").as("cl"), col("nn")))
    val w = Window.partitionBy("token")
    cells
      .withColumn("ct", sum("c").over(w))
      .join(labelTotals, Seq("label"))
      .groupBy(col("token"), col("ct"), col("nn"))
      .agg(round(sum(
        (col("c").cast("double") / col("nn")) *
          log((col("c").cast("double") * col("nn")) /
            (col("ct").cast("double") * col("cl")))), 6).as("mi"))
      .filter(col("ct") * massDen >= col("nn"))
      .select(col("token"), col("ct").as("n_t"), col("mi"))
  }

  /** Dunning log-likelihood-ratio keyness: for each token, how
    * over/under-represented it is in corpus A (`isCorpusA` true)
    * versus corpus B. G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)) with
    * E_a = N_A·(a+b)/(N_A+N_B) — the corpus-comparison statistic that
    * (unlike raw frequency ratios) doesn't explode on rare tokens,
    * and (unlike [[tokenLabelMI]]'s corpus-wide average) scores EACH
    * token. `signed_llr` carries the direction: positive = key in A.
    * Zero counts contribute 0 (x·ln x → 0), so single-corpus tokens
    * are well-defined.
    *
    * Determinism: a, b, N_A, N_B are int64; each token's G² is a
    * fixed dag of correctly-rounded double ops on identical operands
    * — no cross-row accumulation at all. Round-6 absorbs libm 1-ulp
    * drift.
    *
    * Scale shape: one token-count shuffle with map-side combine and a
    * 1-row totals broadcast; everything else is per-token map work. */
  def llrKeyness(docs: DataFrame, textCol: String, isCorpusA: org.apache.spark.sql.Column,
                 minCount: Long): DataFrame = {
    val cnt = docs
      .select(when(isCorpusA, lit(1L)).otherwise(lit(0L)).as("_ia"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(sum("_ia").as("a"), (count(lit(1)) - sum("_ia")).as("b"))
    val tot = cnt.agg(sum("a").as("_na"), sum("b").as("_nb"))
    val eA = col("_na").cast("double") * (col("a") + col("b")) /
      (col("_na") + col("_nb"))
    val eB = col("_nb").cast("double") * (col("a") + col("b")) /
      (col("_na") + col("_nb"))
    val term = (c: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =>
      when(c > 0, c.cast("double") * log(c.cast("double") / e)).otherwise(lit(0.0))
    cnt.filter(col("a") + col("b") >= minCount)
      .crossJoin(broadcast(tot))
      .withColumn("_g2", round(lit(2.0) * (term(col("a"), eA) + term(col("b"), eB)), 6))
      .select(col("token"), col("a"), col("b"),
        when(col("a") * col("_nb") >= col("b") * col("_na"), col("_g2"))
          .otherwise(-col("_g2")).as("signed_llr"))
  }

  /** Hashing-trick sparse featurization: every token folds into one
    * of `dim` buckets by md5, signed ±1 by an independent md5 bit
    * (the sign trick keeps the hashed inner product unbiased —
    * Weinberger et al., public). Output is the sparse vector as
    * (doc_id, bucket, weight) rows, exact-zero cancellations
    * dropped. The fixed-width representation a downstream linear
    * model or MinHash-free similarity join consumes.
    *
    * Scale shape: token explode → ONE map-side-combinable (doc,
    * bucket) aggregation — bucket count is bounded by `dim`, so the
    * shuffle carries ≤ dim rows per doc regardless of document
    * length. md5 keeps buckets/signs engine-replayable. */
  def featureHash(docs: DataFrame, dim: Int = 256,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(dim >= 2)
    import graft.functions.HashFunctions.md5Long
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .withColumn("bucket", pmod(md5Long(col("term")), lit(dim)))
      .withColumn("sign",
        when(md5Long(concat(lit("sign:"), col("term"))) % 2 === 0, lit(1L))
          .otherwise(lit(-1L)))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sign")).as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** N-gram novelty: the fraction of a document's distinct n-grams
    * that appear NOWHERE else in the corpus (df = 1). High novelty
    * separates genuinely new content from remixes/boilerplate — the
    * complement of the dedup family's overlap scores, useful as a
    * curation feature rather than a drop decision. Documents with
    * fewer than n tokens have no n-grams and are omitted.
    *
    * Scale shape: one (gram) shuffle builds the df table; the join
    * back is gram-co-partitioned (reuses the same hash keys), then
    * one map-side-combinable per-doc aggregation. Shingles are
    * distinct per doc, so df counts documents, not occurrences. */
  def ngramNovelty(docs: DataFrame, n: Int = 3,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.HashFunctions.shingles(col(textCol), n)).as("g"))
    val dfTab = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(dfTab, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  /** Broadcast-dictionary keyword tagging: which of a (small) tag
    * vocabulary each document mentions — the scan-speed analog of an
    * Aho-Corasick tagger for dictionary sizes that broadcast. Tags
    * come back sorted and joined so the row is one string (stable
    * for storage and hashing); `n_tags` feeds coverage dashboards.
    * Zero shuffle: `array_intersect` against a literal array inside
    * the projection. */
  def tagKeywords(docs: DataFrame, keywords: Seq[String],
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(keywords.nonEmpty)
    val tags = array_sort(array_intersect(
      array_distinct(tokens(col(textCol))),
      array(keywords.map(lit): _*)))
    docs.select(col(idCol).as("doc_id"),
      array_join(tags, ",").as("tags"), size(tags).as("n_tags"))
  }

  /** Discrete power-law tail exponent (Clauset et al.'s MLE, public):
    * α = 1 + n / Σ ln(x/xmin) over x ≥ xmin, per group — the
    * heavy-tail read-out for document-length / frequency
    * distributions (α ≈ 2–3 is the web-corpus norm; drift says the
    * generator or filter changed). Each ln term quantizes to
    * µ-units (×10⁶, floor+½) so the sum is an exact int64 and the
    * estimate replays cross-engine; the α read-out divides exact
    * integers.
    *
    * Scale shape: one filter + one map-side-combinable aggregation
    * per group. Groups with Σ = 0 (all mass AT xmin) return null. */
  def powerLawAlpha(df: DataFrame, groupCol: String, valueCol: String,
                    xmin: Long): DataFrame = {
    require(xmin >= 1)
    val li = floor(log(col(valueCol).cast("double") / xmin) * 1000000 +
      lit(0.5)).cast("long")
    df.filter(col(valueCol) >= xmin && col(groupCol).isNotNull)
      .select(col(groupCol), li.as("_l"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tail"), sum("_l").as("_s"))
      .select(col(groupCol), col("n_tail"),
        round(lit(1.0) + col("n_tail").cast("double") * 1000000.0 /
          when(col("_s") > 0, col("_s")), 6).as("alpha"))
  }

  /** Term burstiness: variance-to-mean ratio (index of dispersion)
    * of per-document counts for the corpus's top-N terms. VMR ≈ 1 is
    * Poisson (function words); VMR ≫ 1 marks bursty topical terms —
    * the signal term-weighting and boilerplate detection read.
    * Documents NOT containing the term count as zeros: only Σc and
    * Σc² are aggregated (missing docs contribute nothing) and the
    * corpus size D enters as an exact broadcast scalar.
    *
    * Scale shape: one (doc, term) reduction, one term-level
    * aggregation, a 1-row broadcast, TakeOrdered top-N. All VMR
    * operands are exact int64 sums. */
  def termBurstiness(docs: DataFrame, topN: Int = 20,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(topN >= 1)
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("_c"))
    val stats = perDoc.groupBy("term")
      .agg(sum("_c").as("total"), sum(col("_c") * col("_c")).as("_sq"),
        count(lit(1)).as("n_docs_with"))
    val d = docs.agg(count(lit(1)).as("_D"))
    val mean = col("total").cast("double") / col("_D")
    stats.crossJoin(broadcast(d))
      .orderBy(col("total").desc, col("term")).limit(topN)
      .select(col("term"), col("total"), col("n_docs_with"),
        round((col("_sq").cast("double") / col("_D") - mean * mean) / mean, 6)
          .as("vmr"))
  }

  /** Zipf slope of the term-frequency distribution: OLS fit of
    * ln(freq) against ln(rank) over the top-N terms — the one-number
    * "is this corpus naturally distributed" check (natural language
    * sits near −1; template/boilerplate corpora flatten, spammy
    * repetition steepens). Complements [[powerLawAlpha]], which fits
    * document LENGTHS; this fits the VOCABULARY. One row: n_terms,
    * slope, intercept.
    *
    * Exactness: ranks are deterministic ((freq desc, term asc)
    * row_number over the top-N relation); each term's ln-rank,
    * ln-freq, their product and square are µ-quantized (×10⁶) to
    * int64 before summation — order-free exact sums (the
    * powerLawAlpha recipe); the OLS algebra then runs on identical
    * de-scaled doubles in any engine.
    *
    * Scale shape: one map-side-combined term count (the only shuffle
    * that sees corpus-order data), TakeOrdered top-N, then a window
    * + reduction over the BOUNDED top-N relation. */
  def zipfSlope(docs: DataFrame, topN: Int = 1000,
                textCol: String = "text"): DataFrame = {
    require(topN >= 2)
    val freqs = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("_f"))
      .orderBy(col("_f").desc, col("term")).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_f").desc, col("term"))
    val micro = (c: org.apache.spark.sql.Column) =>
      floor(c * 1000000 + lit(0.5)).cast("long")
    val x = log(col("_r").cast("double"))
    val y = log(col("_f").cast("double"))
    val sums = freqs.withColumn("_r", row_number().over(w))
      .select(micro(x).as("_qx"), micro(y).as("_qy"),
        micro(x * y).as("_qxy"), micro(x * x).as("_qxx"))
      .agg(count(lit(1)).as("n_terms"), sum("_qx").as("_sx"),
        sum("_qy").as("_sy"), sum("_qxy").as("_sxy"),
        sum("_qxx").as("_sxx"))
    val nD = col("n_terms").cast("double")
    val sx = col("_sx").cast("double") / 1000000
    val sy = col("_sy").cast("double") / 1000000
    val sxy = col("_sxy").cast("double") / 1000000
    val sxx = col("_sxx").cast("double") / 1000000
    val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
    sums.select(col("n_terms"), round(slope, 6).as("slope"),
      round((sy - slope * sx) / nD, 6).as("intercept"))
  }

  /** Per-document lexical diversity: type–token ratio and in-doc
    * hapax fraction — the cheap gibberish/boilerplate signals
    * ("aaaa aaaa" has TTR → 0; natural prose has a stable band) that
    * complement corpus-level [[termBurstiness]]. One row per doc
    * with ≥1 token: (doc_id, n_tokens, n_types, ttr, hapax_frac).
    * Exact int counts; the two ratios are single divisions.
    *
    * Scale shape: one reduced (doc, term) shuffle, one doc-key agg —
    * the standard text-stats shape, nothing global. */
  def lexicalDiversity(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id")
      .agg(sum("_c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("_hapax").cast("double") / col("n_types"), 6)
          .as("hapax_frac"))
  }

  /** PII density score: emails + phone-shaped runs per 1000 chars,
    * with a gate flag — the curation METRIC next to [[redactPii]]'s
    * scrub (redaction fixes documents; density DECIDES which
    * documents/sources are too contaminated to keep at all, the
    * scraped-form-dump detector). Zero-length docs score 0.
    *
    * Scale shape: pure scan-speed projection — the same two regex
    * passes the redactor runs, counts only. */
  def piiDensity(docs: DataFrame, threshold: Double = 5.0,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val e = size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
    val p = size(regexp_extract_all(
      regexp_replace(text, EmailRe, "<EMAIL>"), lit(PhoneRe), lit(0)))
      .cast("long")
    val dens = when(length(text) > 0,
      (e + p).cast("double") * 1000 / length(text)).otherwise(lit(0.0))
    docs.select(col(idCol), e.as("n_emails"), p.as("n_phones"),
      round(dens, 6).as("pii_per_kchar"),
      (round(dens, 6) > threshold).as("flagged"))
  }

  /** Declared-vs-detected language mismatch rate per source: the
    * label-noise audit ("which crawl feed lies about its language")
    * that decides whether a source's `lang` column can gate training
    * mixes or needs re-detection. One bounded row per source.
    *
    * Scale shape: the language-ID projection is scan-speed; one
    * map-side-combined source agg. Exact counts, one division. */
  def langMismatch(docs: DataFrame, sourceCol: String = "source",
                   langCol: String = "lang",
                   textCol: String = "text"): DataFrame =
    docs.filter(col(sourceCol).isNotNull && col(langCol).isNotNull)
      .select(col(sourceCol).as("source"),
        (col(langCol) =!= langId(col(textCol))).as("_mm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_mm"), 1L).otherwise(0L)).as("n_mismatch"))
      .withColumn("mismatch_rate",
        round(col("n_mismatch").cast("double") / col("n_docs"), 6))

  /** Collocation mining: top-N adjacent-token bigrams by pointwise
    * mutual information, PMI = ln( P(ab) / (P(a)·P(b)) ) with counts
    * from the corpus — the multi-word-expression detector ("new
    * york", "machine learning") that raw bigram frequency can't give
    * (frequency loves "of the"; PMI loves coupled rarities). A
    * minimum bigram count gates the unstable low-frequency tail.
    *
    * Exactness: all four counts are exact int64; the PMI is one ln
    * over identical double operands; the top-N cut orders on the
    * unrounded PMI with the bigram string as tiebreak — identical
    * doubles on both engines order identically.
    *
    * Scale shape: one bigram reduction and one unigram reduction off
    * the scan (map-side combined), unigram table broadcast back onto
    * the min-count-gated bigram relation (a vocabulary too big to
    * broadcast has no business in a collocation join either —
    * documented bound), 1-row total broadcasts, TakeOrdered top-N. */
  def collocations(docs: DataFrame, minCount: Long = 5L, topN: Int = 30,
                   textCol: String = "text"): DataFrame = {
    require(minCount >= 1 && topN >= 1)
    val toks = tokens(col(textCol))
    val nB = greatest(size(toks) - 1, lit(0))
    val pairs = docs.select(explode(zip_with(
      slice(toks, lit(1), nB), slice(toks, lit(2), nB),
      (a, b) => concat(a, lit(" "), b))).as("bigram"))
    val bc = pairs.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
    val uni = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val n1 = broadcast(uni.agg(sum("c").as("_n1")))
    val n2 = broadcast(bc.agg(sum("c_ab").as("_n2")))
    val pmi = log((col("c_ab").cast("double") / col("_n2")) /
      ((col("c_a").cast("double") / col("_n1")) *
        (col("c_b").cast("double") / col("_n1"))))
    bc.filter(col("c_ab") >= minCount)
      .withColumn("_a", split(col("bigram"), " ").getItem(0))
      .withColumn("_b", split(col("bigram"), " ").getItem(1))
      .join(broadcast(uni.select(col("term").as("_a"), col("c").as("c_a"))),
        Seq("_a"))
      .join(broadcast(uni.select(col("term").as("_b"), col("c").as("c_b"))),
        Seq("_b"))
      .crossJoin(n1).crossJoin(n2)
      .withColumn("_pmi", pmi)
      .orderBy(col("_pmi").desc, col("bigram"))
      .limit(topN)
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("_pmi"), 6).as("pmi"))
  }

  /** BPE merge-candidate statistics: the weighted counts of adjacent
    * CHARACTER pairs inside corpus tokens — exactly the table the
    * first iteration of byte-pair-encoding training ranks to pick
    * its first merge, and the tokenizer-health read-out ("which
    * digraphs dominate this corpus") before committing to a vocab.
    * Top-N rows: (pair, pair_count = Σ term_freq over positions,
    * n_term_positions), ordered (count desc, pair asc).
    *
    * Scale shape: the corpus collapses to the BOUNDED term-frequency
    * vocabulary first (one map-side-combined reduction — the only
    * shuffle that sees corpus-order data); pair expansion then rides
    * distinct terms × term length, vocabulary-bounded regardless of
    * corpus size. Exact int64 counts end-to-end; TakeOrdered top-N. */
  def bpePairStats(docs: DataFrame, topN: Int = 30,
                   textCol: String = "text"): DataFrame = {
    require(topN >= 1)
    val terms = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("_cnt"))
      .filter(length(col("term")) >= 2)
    terms
      .select(col("term"), col("_cnt"),
        explode(sequence(lit(1), length(col("term")) - 1)).as("_i"))
      .select(expr("substring(term, _i, 2)").as("pair"), col("_cnt"))
      .groupBy("pair")
      .agg(sum("_cnt").as("pair_count"),
        count(lit(1)).as("n_term_positions"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topN)
  }

  private def nullifZero(c: org.apache.spark.sql.Column) =
    when(c === 0, lit(null)).otherwise(c)

  /** Good–Turing count-of-counts smoothing over corpus bigrams: for
    * each raw count r ≤ rMax, the adjusted count
    * `r* = (r+1)·N_{r+1}/N_r` and the unseen-mass estimate
    * `p₀ = N₁/N` — the classic LM answer to "how much probability do
    * the n-grams we've NEVER seen deserve", which plain MLE sets to
    * an overconfident zero. `r*` is NULL where N_{r+1} = 0 (the
    * smoothing needs the next bucket; interpolate downstream).
    * Returns one row per r ≤ rMax: (r, n_r, r_star, p_unseen).
    *
    * Scale shape: one bigram explode reduced map-side to (gram,
    * count), then the count-of-counts agg is vocabulary-bounded and
    * everything after runs on ≤ rMax rows. */
  def goodTuring(docs: DataFrame, textCol: String = "text",
                 rMax: Int = 10): DataFrame = {
    require(rMax >= 1)
    val toks = tokens(col(textCol))
    val nt = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(nt - 1, lit(0))),
      slice(toks, lit(2), greatest(nt - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val tf = docs.select(explode(bigrams).as("_b"))
      .groupBy("_b").agg(count(lit(1)).as("_r"))
    val stats = broadcast(tf.agg(sum("_r").as("_N"),
      sum(when(col("_r") === 1, 1L).otherwise(0L)).as("_n1")))
    val coc = tf.groupBy(col("_r").as("r")).agg(count(lit(1)).as("n_r"))
    val next = coc.select((col("r") - 1).as("r"), col("n_r").as("_nr1"))
    coc.filter(col("r") <= rMax)
      .join(next, Seq("r"), "left")
      .crossJoin(stats)
      .select(col("r"), col("n_r"),
        round((col("r") + 1).cast("double") * col("_nr1") / col("n_r"), 6)
          .as("r_star"),
        round(col("_n1").cast("double") / col("_N"), 6).as("p_unseen"))
  }

  /** Flesch reading-ease per document — the classic readability
    * signal next to [[qualityScore]]'s length/punct/stopword blend:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Counts only, no model: words are the engine's standard
    * `[a-z0-9]+` tokens; syllables ≈ vowel RUNS (`[aeiouy]+`) per
    * word floored at 1 (vowel-less tokens like "7" count one);
    * sentences = `[.!?]+` runs floored at 1 (an unpunctuated doc is
    * one sentence). All three are exact integers — the formula is
    * the only floating-point step, on identical operands in any
    * engine (the regexes use no class Java and RE2 disagree on).
    * NULL-text docs are excluded (the counts are undefined, and
    * engines disagree on NULL-array folds — Spark's aggregate
    * yields NULL where DuckDB's coalesced list_sum yields 0).
    * Zero-word docs yield NULL flesch. Scan-only projection: no
    * shuffle, no join; the explode-free HOF keeps it one codegen
    * stage. Returns (id, n_words, n_sentences, n_syllables,
    * flesch). */
  def readability(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val words = regexp_extract_all(lower(col(textCol)),
      lit("[a-z0-9]+"), lit(0))
    val syll = aggregate(transform(words, w =>
      greatest(lit(1), size(regexp_extract_all(w, lit("[aeiouy]+"),
        lit(0))))), lit(0L), (acc, v) => acc + v)
    val sent = greatest(lit(1),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))))
    docs.filter(col(textCol).isNotNull).select(col(idCol),
      size(words).cast("long").as("n_words"),
      sent.cast("long").as("n_sentences"),
      syll.as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(when(col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words"))), 6).as("flesch"))
  }

  /** Padding-efficiency audit: for each candidate sequence length L,
    * the chunk count Σ⌈tok/L⌉, padded token volume Σ⌈tok/L⌉·L, and
    * waste ratio (padded − Σtok)/padded under NAIVE per-document
    * chunk-and-pad — the read that picks max_len before training, and
    * the baseline [[graft.operators.Packing]]'s bin packing is
    * measured against (packing's waste is its bins' slack; this is
    * the no-packing upper bound). Zero-token docs contribute nothing.
    * All integer arithmetic until the single waste-ratio division.
    *
    * Scale shape: one scan computes token counts; the candidate-L
    * fan-out is a literal array explode (|Ls| rows per doc,
    * map-side-combined immediately) — output is |Ls| rows. */
  def paddingAudit(docs: DataFrame, lens: Seq[Int],
                   textCol: String = "text"): DataFrame = {
    require(lens.nonEmpty && lens.forall(_ >= 1))
    val nTok = size(tokens(col(textCol))).cast("long")
    docs.select(nTok.as("_t"))
      .filter(col("_t") > 0)
      .select(col("_t"), explode(lit(lens.toArray)).as("max_len"))
      .withColumn("_chunks", expr("(_t + max_len - 1) div max_len"))
      .groupBy("max_len")
      .agg(count(lit(1)).as("n_docs"), sum("_t").as("n_tokens"),
        sum("_chunks").as("n_chunks"),
        sum(col("_chunks") * col("max_len")).as("padded_tokens"))
      .select(col("max_len"), col("n_docs"), col("n_tokens"),
        col("n_chunks"), col("padded_tokens"),
        round((col("padded_tokens") - col("n_tokens")).cast("double") /
          col("padded_tokens"), 6).as("waste_ratio"))
  }

  /** Chao1 vocabulary-richness estimate: how many distinct types the
    * corpus WOULD show with unbounded sampling — D + f₁(f₁−1)/(2(f₂+1))
    * (the bias-corrected form, defined when no doubletons exist) from
    * the singleton/doubleton counts, plus Good's coverage Ĉ = 1 − f₁/N
    * — the "is this corpus big enough / still growing" read that
    * complements [[goodTuring]]'s per-frequency smoothing and the
    * HLL/KMV sketches' count of what was SEEN. All operands int64;
    * the two output ratios divide identical integers.
    *
    * Scale shape: one (token) reduced shuffle with map-side combine
    * (the corpus crosses the wire once as partial counts), then a
    * vocabulary-sized count-of-counts agg to ONE row. */
  def chao1(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_c"))
    counts.agg(count(lit(1)).as("d_observed"),
        sum("_c").as("n_tokens"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("_c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("d_observed"), col("n_tokens"), col("f1"), col("f2"),
        round(col("d_observed") +
          (col("f1") * (col("f1") - 1)).cast("double") /
            (lit(2L) * (col("f2") + 1)), 6).as("chao1"),
        round(lit(1.0) - col("f1").cast("double") / col("n_tokens"), 6)
          .as("coverage"))
  }

  /** Stupid-backoff trigram LM scoring with a FIT/APPLY split
    * (Brants et al. 2007 — the web-scale LM recipe that skips
    * normalization entirely): score(w₃|w₁w₂) = c₃/c₂(w₁w₂) when the
    * trigram was seen, else α·c₂(w₂w₃)/c₁(w₂), else α²·c₁(w₃)/T —
    * raw relative frequencies with a fixed α = 0.4 penalty per
    * backoff level. The order-3 upgrade of [[bigramLogProb]]'s gate:
    * held-out docs whose trigrams the fit corpus has never seen
    * score low = novelty/noise; memorized boilerplate scores high.
    * Only positions with a full trigram context score; target words
    * outside the fit vocabulary are counted (`n_oov`), not scored.
    *
    * Determinism: all counts are exact int64; each scored position's
    * ln(score) is quantized ×10¹² (identical doubles → identical
    * ints) and the per-doc mean divides two exact integers — no
    * distributed float sum.
    *
    * Returns (doc_id, n_ctx, n_oov, sb_logscore).
    *
    * Scale shape: three reduced gram-count shuffles on the fit side;
    * the apply trigram stream joins each count table co-partitioned
    * on its own key (NOT broadcast — gram vocabularies outgrow
    * drivers at corpus scale, [[bigramLogProb]]'s documented
    * posture); one final doc_id agg. */
  def stupidBackoff(fitDocs: DataFrame, applyDocs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    def tris(docs: DataFrame): DataFrame =
      docs.select(col(idCol).as("doc_id"),
          posexplode(tokens(col(textCol)))).toDF("doc_id", "pos", "w3")
        .select(col("doc_id"), col("pos"), col("w3"),
          lag("w3", 1).over(w).as("w2"), lag("w3", 2).over(w).as("w1"))
    val fit = tris(fitDocs)
    val c1 = fit.groupBy(col("w3").as("u")).agg(count(lit(1)).as("_c1"))
    val c2 = fit.filter(col("w2").isNotNull)
      .groupBy(col("w2").as("b1"), col("w3").as("b2"))
      .agg(count(lit(1)).as("_c2"))
    val c3 = fit.filter(col("w1").isNotNull)
      .groupBy(col("w1").as("t1"), col("w2").as("t2"), col("w3").as("t3"))
      .agg(count(lit(1)).as("_c3"))
    val tot = broadcast(fit.agg(count(lit(1)).as("_tot")))
    val ap = tris(applyDocs).filter(col("w1").isNotNull)
    val joined = ap
      .join(c3, col("w1") === col("t1") && col("w2") === col("t2") &&
        col("w3") === col("t3"), "left")
      .join(c2.toDF("p1", "p2", "_c2den"),
        col("w1") === col("p1") && col("w2") === col("p2"), "left")
      .join(c2.toDF("q1", "q2", "_c2num"),
        col("w2") === col("q1") && col("w3") === col("q2"), "left")
      .join(c1.toDF("u1", "_c1den"), col("w2") === col("u1"), "left")
      .join(c1.toDF("u2", "_c1num"), col("w3") === col("u2"), "left")
      .crossJoin(tot)
    val score =
      when(col("_c3").isNotNull,
        col("_c3").cast("double") / col("_c2den"))
      .otherwise(when(col("_c2num").isNotNull,
        lit(alpha) * col("_c2num").cast("double") / col("_c1den"))
      .otherwise(
        lit(alpha * alpha) * col("_c1num").cast("double") / col("_tot")))
    val q = floor(log(score) * 1e12 + lit(0.5)).cast("long")
    joined
      .select(col("doc_id"), q.as("_q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ctx"),
        sum(when(col("_q").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(sum(col("_q")).cast("double") / 1e12 /
          when(count(col("_q")) > 0, count(col("_q"))), 6)
          .as("sb_logscore"))
  }

  /** Heaps'-law vocabulary-growth exponent: V(N) ≈ K·N^β — how fast
    * the distinct-token vocabulary grows as the corpus grows, the
    * saturation read a tokenizer/dedup pipeline plans against
    * (β → 1: vocabulary explodes, near-unique tokens — ids, hashes,
    * noise; β ≈ 0.4–0.6: natural text; β → 0: saturated). Measured
    * at five dyadic doc_id prefixes (maxId·{1,2,4,8,16} div 16):
    * each prefix's N = token occurrences and V = distinct tokens,
    * β = OLS slope of ln V on ln N over the five points.
    *
    * The whole estimator avoids distributed float sums: V comes
    * from each token's min-doc_id FIRST OCCURRENCE (count tokens
    * with first ≤ threshold — one distinct pass serves all five
    * prefixes), N from conditional integer sums; ln N / ln V are
    * quantized ×10¹² to int64 (identical doubles → identical ints)
    * and the 5-point OLS slope is a single fixed expression over
    * decimal(38,0) products. NULL β if any prefix is empty.
    *
    * Returns one row (n_docs, n_tokens, vocab_size, heaps_beta).
    *
    * Scale shape: one doc-level scan for per-doc token counts, one
    * map-side-combinable (token) shuffle for first occurrences, two
    * 1-row aggs and a broadcast — no window, no join wider than a
    * 1-row cross; prefix thresholds are integer arithmetic on the
    * max id (no quantile pass). */
  def heapsLaw(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    val toks = docs.filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("_id"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9]+"), lit(0))).as("_tok"))
    val firsts = toks.groupBy(col("_tok")).agg(min("_id").as("_first"))
    val perDoc = docs.filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("_id"),
        size(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9]+"), lit(0))).cast("long").as("_nt"))
    val mx = perDoc.agg(max("_id").as("_mx"))
    val js = Seq(1, 2, 4, 8, 16)
    def thr(j: Int) = expr(s"_mx * $j div 16")
    val vCols = js.map(j => sum(when(col("_first") <= thr(j), 1L)
      .otherwise(0L)).as(s"_v$j"))
    val vAgg = firsts.crossJoin(broadcast(mx))
      .agg(vCols.head, vCols.tail: _*)
    val nCols = count(lit(1)).as("n_docs") +:
      js.map(j => sum(when(col("_id") <= thr(j), col("_nt"))
        .otherwise(0L)).as(s"_n$j"))
    val nAgg = perDoc.crossJoin(broadcast(mx))
      .agg(nCols.head, nCols.tail: _*)
    val one = vAgg.crossJoin(broadcast(nAgg))
    def lq(c: org.apache.spark.sql.Column) =
      floor(log(when(c > 0, c.cast("double"))) * 1e12 +
        lit(0.5)).cast("long")
    val xs = js.map(j => lq(col(s"_n$j")))
    val ys = js.map(j => lq(col(s"_v$j")))
    val p = lit(5L).cast(dec)
    val sx = xs.map(_.cast(dec)).reduce(_ + _)
    val sy = ys.map(_.cast(dec)).reduce(_ + _)
    val sxy = xs.zip(ys).map { case (x, y) => x.cast(dec) * y.cast(dec) }
      .reduce(_ + _)
    val sxx = xs.map(x => x.cast(dec) * x.cast(dec)).reduce(_ + _)
    val den = (p * sxx - sx * sx).cast("double")
    val beta = (p * sxy - sx * sy).cast("double") / when(den > 0, den)
    one.select(col("n_docs"), col("_n16").as("n_tokens"),
      col("_v16").as("vocab_size"),
      round(beta, 6).as("heaps_beta"))
  }

  /** Exact phrase search over the positional token relation: docs
    * containing the words of `phrase` CONSECUTIVELY, with match
    * count and first position — the capability a bag-of-words
    * [[invertedIndex]]/[[bm25]] retrieval can't express ("new york"
    * vs "york new"). The classic positional-postings AND-merge:
    * word w at offset i must sit at position p + i for a match
    * anchored at p.
    *
    * Integer-only (token positions), engine-exact.
    *
    * Returns (doc_id, n_matches, first_pos).
    *
    * Scale shape: each phrase word's postings are a term-filtered
    * slice of the token scan (the filter pushes to the scan — no
    * full index materialization), and the AND-merge is |phrase|−1
    * equi-joins on (doc, aligned position) whose sides are
    * postings-sized, not corpus-sized. Exactly how Lucene-class
    * engines run phrase queries, expressed relationally. */
  def phraseSearch(docs: DataFrame, phrase: String,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val words = phrase.toLowerCase.split("\\s+").filter(_.nonEmpty)
    require(words.nonEmpty, "phrase must contain at least one word")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
    val first = toks.filter(col("term") === words(0))
      .select(col("doc_id"), col("pos"))
    val matched = words.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(toks.filter(col("term") === w)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min("pos").cast("long").as("first_pos"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each word scores
    * degree/frequency (degree = Σ lengths of the phrases it appears
    * in — words that live in LONG phrases co-occur more), a phrase
    * scores the sum of its words — the document-set keyPHRASE view
    * that per-term TF-IDF ([[tfIdf]]) and PMI pairs
    * ([[collocations]]) can't give ("support vector machine" as one
    * unit). Phrases longer than `maxLen` drop (RAKE's noise guard).
    *
    * Determinism: phrase text is rebuilt from a position-sorted
    * struct array (order-free collect); word scores ride as
    * floor(degree·10⁹/freq) int64, phrase scores are integer sums,
    * and the final top-k orders by (score, phrase) — total.
    *
    * Returns the top `topK` rows (phrase, n_occurrences, n_words,
    * rake_score).
    *
    * Scale shape: one positional explode (corpus-token-sized,
    * reduced map-side per (doc, segment)), one vocabulary-sized word
    * agg joined back, one phrase-text agg, and a
    * TakeOrderedAndProject top-k — never a global sort
    * materialization. */
  def rakeKeyphrases(docs: DataFrame, topK: Int = 50,
                     maxLen: Int = 4): DataFrame = {
    import graft.functions.TextFunctions.StopEn
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1 && maxLen >= 1)
    val toks = docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .withColumn("_stop", col("term").isInCollection(StopEn))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val seg = toks
      .withColumn("_seg", sum(when(col("_stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("_stop"))
    val phrases = seg.groupBy(col("doc_id"), col("_seg"))
      .agg(count(lit(1)).as("_len"),
        transform(array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term")).as("_ws"))
      .filter(col("_len") <= maxLen)
      .withColumn("phrase", array_join(col("_ws"), " "))
    val ws = phrases.select(col("_len"), explode(col("_ws")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("_f"), sum("_len").as("_d"))
      .select(col("term"),
        // (d/f)·1e9 stays < 2⁵³ for any corpus; d·1e9 first would not
        floor(col("_d").cast("double") / col("_f") * 1e9).cast("long")
          .as("_wq"))
    val inst = phrases
      .select(col("doc_id"), col("_seg"), col("phrase"), col("_len"),
        explode(col("_ws")).as("term"))
      .join(ws, Seq("term"))
      .groupBy(col("doc_id"), col("_seg"), col("phrase"), col("_len"))
      .agg(sum("_wq").as("_score"))
    inst.groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"), max("_len").as("n_words"),
        max("_score").as("_s"))
      .orderBy(col("_s").desc, col("phrase")).limit(topK)
      .select(col("phrase"), col("n_occurrences"), col("n_words"),
        round(col("_s").cast("double") / 1e9, 6).as("rake_score"))
  }

  /** Burrows' Delta stylometry (Burrows 2002): per doc, z-score the
    * relative frequencies of the function-word set against the
    * corpus; a doc's distance to a SOURCE is the mean |z_doc − z̄_src|
    * over those words, and the nearest profile is the attribution —
    * the classic authorship / provenance read (function words are
    * topic-free, so this clusters by STYLE where TF-IDF clusters by
    * subject; in a training-data pipeline it audits "does this
    * source's style match its label"). Function words = the
    * [[graft.functions.TextFunctions.StopEn]] list; words with zero
    * cross-doc variance drop. Profiles include the doc itself
    * (in-sample attribution — the drift AUDIT read, not a holdout
    * eval).
    *
    * Determinism: relative frequencies quantize ×10⁹, z-scores ×10⁶
    * (fixed double expressions over exact integer moments), profile
    * means are exact integer (Σzq, n) pairs, and each |Δz| term
    * re-quantizes before the per-doc sum — order-free end to end.
    *
    * Returns per source: (source, n_docs, n_correct, accuracy,
    * mean_best_delta).
    *
    * Scale shape: one token scan reduced to (doc × 10 words); stats
    * and profiles are words- and (sources × words)-sized broadcasts;
    * the doc × source scoring is |sources|-fanout on the quantized
    * (doc, word) relation — linear in docs for a fixed source
    * catalog. */
  def burrowsDelta(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   sourceCol: String = "source"): DataFrame = {
    import graft.functions.TextFunctions.StopEn
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = docs.filter(col(sourceCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("_src"),
        tokens(col(textCol)).as("_tk"))
      .withColumn("_n", size(col("_tk")).cast("long"))
      .filter(col("_n") > 0)
    val counts = base
      .select(col("doc_id"), explode(col("_tk")).as("term"))
      .filter(col("term").isInCollection(StopEn))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("_c"))
    val wordSpine = broadcast(docs.sparkSession.range(1)
      .select(explode(array(StopEn.map(lit): _*)).as("term")))
    val fq = base.select("doc_id", "_src", "_n").crossJoin(wordSpine)
      .join(counts, Seq("doc_id", "term"), "left")
      .select(col("doc_id"), col("_src"), col("term"),
        floor(coalesce(col("_c"), lit(0L)).cast("double") / col("_n") *
          1e9 + lit(0.5)).cast("long").as("_fq"))
    val stats = fq.groupBy("term").agg(count(lit(1)).as("_nd"),
        sum("_fq").as("_s"), sum(dec(col("_fq")) * col("_fq")).as("_q"))
      .filter(col("_nd") >= 2 &&
        col("_q") * col("_nd") > dec(col("_s")) * col("_s"))
    val ndD = col("_nd").cast("double")
    val mu = col("_s").cast("double") / ndD
    val sd = sqrt((col("_q").cast("double") - ndD * mu * mu) / (ndD - 1.0))
    val z = fq.join(broadcast(stats), Seq("term"))
      .select(col("doc_id"), col("_src"), col("term"),
        floor((col("_fq").cast("double") - mu) / sd * 1e6 + lit(0.5))
          .cast("long").as("_zq"))
    val prof = broadcast(z.groupBy(col("_src").as("_ps"), col("term"))
      .agg(sum("_zq").as("_zs"), count(lit(1)).as("_zn")))
    val kRel = broadcast(stats.agg(count(lit(1)).as("_k")))
    val pairs = z.join(prof, Seq("term"))
      .select(col("doc_id"), col("_src"), col("_ps"),
        floor(abs(col("_zq").cast("double") -
          col("_zs").cast("double") / col("_zn")) + lit(0.5))
          .cast("long").as("_d"))
      .groupBy("doc_id", "_src", "_ps").agg(sum("_d").as("_dsum"))
    val best = pairs.groupBy("doc_id", "_src")
      .agg(min(struct(col("_dsum"), col("_ps"))).as("_m"))
      .select(col("doc_id"), col("_src"),
        col("_m._ps").as("_pred"), col("_m._dsum").as("_bd"))
    best.groupBy(col("_src").as(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_pred") === col("_src"), 1L).otherwise(0L))
          .as("n_correct"),
        sum(col("_bd").cast("decimal(38,0)")).as("_bds"))
      .crossJoin(kRel)
      .select(col(sourceCol), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_docs"), 6)
          .as("accuracy"),
        round(col("_bds").cast("double") / col("n_docs") /
          (col("_k").cast("double") * 1e6), 6).as("mean_best_delta"))
  }

  /** TextTiling-style topic segmentation (Hearst 1997, the lexical-
    * cohesion form): split each doc into `blockTokens`-token blocks,
    * score each adjacent-block GAP by vocabulary Jaccard, and mark a
    * boundary where the cohesion dips — a local minimum whose depth
    * ((left − here) + (right − here)) clears `minDepth` — the
    * topic-shift detector behind context-aware chunking (fixed-size
    * chunking (q57/q183) cuts mid-topic; this cuts WHERE THE
    * VOCABULARY TURNS OVER, which is what a RAG/packing pipeline
    * actually wants).
    *
    * Block vocabularies come straight from array slices of the token
    * array (no positional explode); similarities quantize ×10⁶ from
    * exact set sizes — integer-only end to end.
    *
    * Returns (doc_id, gap_index, sim, depth, boundary) per gap of
    * docs with ≥ 2 blocks; edge gaps score a one-sided depth (the
    * missing neighbor contributes 0 by the coalesce-to-self rule).
    *
    * Scale shape: one scan carrying token arrays, a per-doc explode
    * bounded by doc length / blockTokens, one doc-keyed window for
    * lag/lead — no joins. */
  def textTiling(docs: DataFrame, blockTokens: Int = 25,
                 minDepth: Double = 0.2, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockTokens >= 1 && minDepth >= 0)
    val base = docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("_tk"))
      .withColumn("_nb",
        ceil(size(col("_tk")).cast("double") / blockTokens).cast("int"))
      .filter(col("_nb") >= 2)
    val blocks = base
      .select(col("doc_id"), col("_tk"),
        explode(expr(s"sequence(0, _nb - 1)")).as("_b"))
      .withColumn("_set", expr(
        s"array_distinct(slice(_tk, _b * $blockTokens + 1, $blockTokens))"))
      .drop("_tk")
    val w = Window.partitionBy("doc_id").orderBy("_b")
    val inter = size(array_intersect(col("_set"), col("_prev")))
    val gaps = blocks
      .withColumn("_prev", lag("_set", 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col("doc_id"), col("_b").as("gap_index"),
        floor(inter.cast("double") * 1e6 /
          (size(col("_set")) + size(col("_prev")) - inter))
          .cast("long").as("_sq"))
    val wg = Window.partitionBy("doc_id").orderBy("gap_index")
    gaps
      .withColumn("_ls", lag("_sq", 1).over(wg))
      .withColumn("_rs", lead("_sq", 1).over(wg))
      .select(col("doc_id"), col("gap_index"),
        round(col("_sq").cast("double") / 1e6, 6).as("sim"),
        round((coalesce(col("_ls"), col("_sq")) - col("_sq") +
          coalesce(col("_rs"), col("_sq")) - col("_sq"))
          .cast("double") / 1e6, 6).as("depth"))
      .withColumn("boundary", col("depth") > minDepth)
  }

  /** Log-template mining (the Drain idea, one relational pass):
    * group lines by (token count, first token), and per group emit
    * the template whose positions keep their token where EVERY line
    * agrees and become `<*>` where they differ — "status=<*>" from a
    * million concrete status lines. The log-intelligence primitive
    * (dedup, anomaly baselining, alert routing all run on templates,
    * not raw lines); here it doubles as a boilerplate detector over
    * any line-structured text column.
    *
    * Deterministic: the group key and per-position distinct counts
    * are exact; kept tokens are the position's single distinct
    * value.
    *
    * Returns (template, n_lines, n_tokens, n_wildcards).
    *
    * Scale shape: one token explode reduced map-side per
    * (group, position, token), a (group, position) distinct-count,
    * and a group-sized template reassembly — the inverted-index
    * cost class, no joins against the raw lines. */
  def logTemplates(lines: DataFrame,
                   lineCol: String = "line"): DataFrame = {
    val base = lines.filter(col(lineCol).isNotNull)
      .select(split(col(lineCol), " ").as("_tk"))
      .select(col("_tk"), size(col("_tk")).as("_n"),
        element_at(col("_tk"), 1).as("_t0"))
    val grpLines = base.groupBy("_n", "_t0")
      .agg(count(lit(1)).as("n_lines"))
    val posTok = base
      .select(col("_n"), col("_t0"), posexplode(col("_tk"))
        .as(Seq("_p", "_tok")))
      .groupBy("_n", "_t0", "_p")
      .agg(countDistinct(col("_tok")).as("_nd"), min("_tok").as("_one"))
    val tmpl = posTok
      .withColumn("_out",
        when(col("_nd") === 1, col("_one")).otherwise(lit("<*>")))
      .groupBy("_n", "_t0")
      .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(_p, _out))), x -> x._out)"),
          " ").as("template"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_wildcards"))
    tmpl.join(grpLines, Seq("_n", "_t0"))
      .select(col("template"), col("n_lines"),
        col("_n").cast("long").as("n_tokens"), col("n_wildcards"))
  }
}
