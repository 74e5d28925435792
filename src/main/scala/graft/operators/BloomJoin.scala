package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pre-filtered equi-join — the explicit form of the runtime
  * row-group filtering engines apply to selective joins: build a
  * bloom sketch of the SMALL side's keys ([[Sketches.bloomBuild]]'s
  * 63-bit word table), densify it into ONE broadcast array row, and
  * drop non-matching big-side rows at scan speed BEFORE the join's
  * shuffle. The result is exactly `big ⋈ small` (false positives
  * survive the pre-filter but die in the real join; blooms have no
  * false negatives) — only the shuffle volume changes: with a 1%-
  * selective dimension, ~99% of the 100 TB side never leaves its
  * scan task.
  */
object BloomJoin {

  /** Per-row membership expression against the densified word array
    * (all `k` probe bits set). Scan-speed: a fixed chain of integer
    * ops and `element_at`s per row — no explode, no per-key groupBy
    * (contrast [[Sketches.bloomProbe]], the per-distinct-key probe). */
  private def memberExpr(key: Column, words: Int, k: Int): Column = {
    val m = words * 63L
    val h = graft.functions.HashFunctions.baseHash30(key.cast("string"))
    (0 until k).map { i =>
      val pos = graft.functions.HashFunctions.affine(h, i) % m
      val mask = call_function("shiftleft", lit(1L), (pos % 63).cast("int"))
      (element_at(col("_bloom"), floor(pos / 63).cast("int") + 1)
        .bitwiseAND(mask)) =!= 0L
    }.reduce(_ && _)
  }

  /** Inner equi-join of `big` and `small` on `keyCol`, with the big
    * side bloom-pre-filtered. `words`·63 bits of sketch; size it to
    * the small side's key count (the usual ~10 bits/key for ~1% false
    * positives). Joins NULL-safely identical to a plain inner join:
    * NULL keys never match, and the pre-filter drops them early. */
  def bloomJoin(big: DataFrame, small: DataFrame, keyCol: String,
                words: Int = 256, k: Int = 4): DataFrame = {
    // keys hash via their canonical string form on BOTH sides (the
    // md5 base hash is string-typed), so any key type works
    val sketch = Sketches.bloomBuild(
      small.select(col(keyCol).cast("string").as(keyCol)), keyCol, words, k)
    // densify (word, bits) rows into one array row: index w+1 holds
    // word w's bits, absent words 0 — a single broadcast row the
    // member expression indexes with element_at
    val dense = broadcast(sketch.agg(
      expr(s"aggregate(collect_list(struct(word, bits)), " +
        s"array_repeat(CAST(0 AS BIGINT), $words), " +
        "(acc, x) -> transform(acc, (v, i) -> IF(i = x.word, x.bits, v)))")
        .as("_bloom")))
    big.filter(col(keyCol).isNotNull)
      .crossJoin(dense)
      .filter(memberExpr(col(keyCol), words, k))
      .drop("_bloom")
      .join(small, Seq(keyCol))
  }
}
