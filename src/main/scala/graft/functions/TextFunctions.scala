package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data
  * pipelines (BASELINE.json north-star extensions; SURVEY.md §2.11).
  *
  * Everything is a native `Column` expression (higher-order array
  * functions, regex, md5) — no UDFs — so whole-stage codegen and
  * column pruning stay in effect, and every function has an exact
  * ANSI-SQL dual runnable by the DuckDB oracle.
  *
  * Scale: all functions are per-row (embarrassingly parallel, no
  * shuffle); at 100 TB they run at scan speed behind whatever
  * projection uses them.
  */
object TextFunctions {

  /** Word tokens: lowercased maximal `[a-z0-9]+` runs, exactly the
    * oracle dual `regexp_extract_all(lower(x), '[a-z0-9]+')` — served
    * by the codegen byte-scan [[graft.plans.TokensOf]] instead of the
    * regex (guide §4: the Matcher + per-match allocation sat under
    * every text operator's scan; the kernel's equivalence contract
    * and its property test against this exact regex live with the
    * expression). [[tokensRegex]] keeps the original formulation as
    * the spec's reference implementation. */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.TokensOf(
      org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** The regex reference formulation of [[tokens]] (spec-only). */
  def tokensRegex(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alnum-non-space marks each count as one token — the shape of
    * a byte-pair pre-tokenizer without a vocab. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Punctuation/symbol character count (anything not alnum/space). */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))

  /** Total characters across tokens (alnum mass of the document). */
  def alnumChars(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  /** Count of tokens present in `stop` (duplicates counted — this is
    * a ratio numerator, not set membership). */
  def stopwordCount(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isin(stop: _*)))

  /** CJK characters (Basic Multilingual Plane unified ideographs). */
  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deterministic, shared with the oracle. */
  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val StopDe = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von")
  val StopFr = Seq("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour")
  val StopEs = Seq("el", "los", "las", "y", "es", "si", "una", "como", "por", "para")

  /** Language-ID: CJK presence wins, else the language with the most
    * stopword hits, ties resolved by fixed priority en>de>fr>es. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val cEn = stopwordCount(toks, StopEn)
    val cDe = stopwordCount(toks, StopDe)
    val cFr = stopwordCount(toks, StopFr)
    val cEs = stopwordCount(toks, StopEs)
    when(cjkCount(text) > 0, "zh")
      .when(cEn >= cDe && cEn >= cFr && cEn >= cEs, "en")
      .when(cDe >= cFr && cDe >= cEs, "de")
      .when(cFr >= cEs, "fr")
      .otherwise("es")
  }

  /** Normalized form for fingerprinting: lowercase, whitespace runs
    * collapsed to single spaces, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content-defined document fingerprint: md5 of the normalized
    * text. Survives whitespace/case-only edits. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** 60-bit integer fingerprint (first 15 hex digits of md5) — fits a
    * signed 64-bit key for joins/bucketing at scale. */
  def fingerprint64(text: Column): Column =
    conv(substring(fingerprint(text), 1, 15), 16, 10).cast("long")
}
