package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hashing primitives.
  *
  * Everything routes through `md5` (bit-identical in any engine)
  * rather than engine-private hashes (Spark's murmur3 `hash()` or
  * DuckDB's `hash()` would diverge), so every sketch built on these
  * (MinHash, SimHash, fingerprints) is reproducible by the DuckDB
  * oracle and by any other SQL engine — a property worth keeping in a
  * multi-engine lakehouse even at the cost of md5 vs murmur speed.
  */
object HashFunctions {

  /** 60-bit integer hash: first 15 hex digits of md5. Non-negative,
    * fits signed int64 — safe as a join/bucket key. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (distinct) over the token array. Empty
    * array (not null) when the document has fewer than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** One MinHash value: the lexicographic minimum of `md5(seed ":" s)`
    * over the shingle set. Each seed is an independent "permutation";
    * min-by-md5-hex is a valid minwise hash family and is portable
    * because it never leaves hex-string space. Null on empty input. */
  def minhash(shingleSet: Column, seed: Int): Column =
    array_min(transform(shingleSet, s => md5(concat(lit(s"$seed:"), s))))

  /** The k-value MinHash signature as individual columns. */
  def minhashSignature(shingleSet: Column, k: Int): Seq[Column] =
    (0 until k).map(i => minhash(shingleSet, i).as(s"mh$i"))
}
