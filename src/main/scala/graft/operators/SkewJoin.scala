package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Salted equi-join for skewed keys (SURVEY.md "Optimize for scale":
  * salting for skew).
  *
  * When one join key dominates (a celebrity user, a null-ish default
  * id), the plain shuffle join sends that key's every row to one
  * task. Salting splits the hot key across `salts` sub-partitions:
  * the skewed side gets a per-row salt, the other side is replicated
  * once per salt value, and the join key becomes (key, salt). Result
  * set is identical to the unsalted join — only the physical
  * distribution changes, which is why the harness oracle for a salted
  * query is the *plain* SQL join.
  *
  * AQE's skew-join splitting handles moderate skew automatically;
  * explicit salting remains the tool when a single key exceeds what
  * one task can hold even after AQE splits, or when the build side of
  * a broadcast is too big and a shuffle join must survive the skew.
  */
object SkewJoin {

  /** @param spread deterministic per-row expression on `left` used to
    *               derive the salt (any column with per-row variety —
    *               a line number, an event id). Determinism keeps the
    *               plan replayable; distribution quality only affects
    *               balance, never correctness. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 spread: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_salt", pmod(hash(spread), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // keys qualified per side: leftKey and rightKey may share a name
    // (pre-aligned frames, self-joins) — unqualified col() would throw
    // an ambiguous-reference AnalysisException
    l.join(r, l("_salt") === r("_salt") && l(leftKey) === r(rightKey))
      .drop("_salt")
  }
}
