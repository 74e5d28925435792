package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join: for every left row, the latest right row with the same
  * key and time strictly before the left row's time. Spark has no
  * built-in as-of operator (SURVEY.md §2.3 lists it absent from the
  * reference too); two compositions are provided:
  *
  *  - [[asOfUnion]] — the scale path: tag both sides, union, one
  *    window pass per key ordered by (time, side, tiebreak) carrying
  *    the last-seen right payload forward. One shuffle + sort, output
  *    linear in |left| + |right| — never the |left|×|candidates|
  *    intermediate of the join formulation, so it survives keys with
  *    millions of right rows.
  *  - [[asOfJoin]] — the join+argmax composition: correct and simple,
  *    intermediate grows with candidates per key; fine for selective
  *    conditions, used as the cross-check in specs.
  *
  * Strictness: a right row at exactly the left row's time is NOT
  * matched (left sorts before right on ties), mirroring a
  * `right.time < left.time` predicate.
  */
object AsOfJoin {

  /** Union+window as-of join.
    *
    * @param leftKey/rightKey   equi-join key column names
    * @param leftTime/rightTime event-time expressions (same type)
    * @param payload            right columns carried to the output
    * @param tiebreak           right columns breaking equal-time ties
    *                           (greatest wins), e.g. an event id
    * @param tolerance          max staleness (same units as the time
    *                           expressions, which must be numeric when
    *                           set): a match older than
    *                           `leftTime − tolerance` is nulled out —
    *                           pandas `merge_asof(tolerance=…)`
    *                           semantics. Correct because the carried
    *                           match is the LATEST predecessor: if it
    *                           is out of tolerance, every candidate is.
    *
    * Row semantics: the matched right row is carried as ONE struct, so
    * every payload column comes from the SAME row — a NULL payload
    * value on the matched row stays NULL (exact merge_asof behavior)
    * rather than falling back to an older row's value, and the
    * row-level tolerance gate is sound for nullable payloads.
    */
  def asOfUnion(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: Column, rightTime: Column,
                payload: Seq[String], tiebreak: Seq[String],
                tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    def nullOf(c: String, from: org.apache.spark.sql.types.StructType) =
      lit(null).cast(from(c).dataType).as(c)

    val lAligned = left
      .select((leftCols.map(col) :+ leftTime.as("_t") :+ lit(0).as("_side")) ++
        (payload ++ tiebreak).distinct.map(c => nullOf(c, rightSchema)): _*)
    val rAligned = right
      .select((leftCols.map(c =>
          if (c == leftKey) col(rightKey).as(c) else nullOf(c, left.schema)) :+
        rightTime.as("_t") :+ lit(1).as("_side")) ++
        (payload ++ tiebreak).distinct.map(col): _*)

    // left rows order before right rows on equal time ⇒ strict "<"
    val w = Window.partitionBy(leftKey)
      .orderBy((col("_t") +: col("_side") +: tiebreak.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the whole right row rides one struct: non-null exactly when the
    // window position has seen a right row, so ignoreNulls skips left
    // rows — never a right row whose payload happens to be NULL
    val rightRow = when(col("_side") === 1,
      struct((col("_t").as("_rt") +: payload.map(col)): _*))
    val carried = lAligned.unionByName(rAligned)
      .select(leftCols.map(col) :+ col("_side") :+ col("_t") :+
        last(rightRow, ignoreNulls = true).over(w).as("_m"): _*)
    val matched = carried.filter(col("_side") === 0)
      .select((leftCols.map(col) :+ col("_t") :+
        col("_m").getField("_rt").as("_rt")) ++
        payload.map(c => col("_m").getField(c).as(c)): _*)
    val bounded = tolerance.fold(matched) { tol =>
      // when() with no otherwise nulls both too-stale and never-matched
      payload.foldLeft(matched)((df, c) =>
        df.withColumn(c, when(col("_t") - col("_rt") <= tol, col(c))))
    }
    bounded.drop("_side", "_t", "_rt")
  }

  /** Join + argmax composition (candidate-explosion shape). */
  def asOfJoin(left: DataFrame, right: DataFrame, cond: Column,
               leftId: Seq[String], ord: Seq[Column]): DataFrame =
    Dedup.argmaxPerKey(left.join(right, cond), leftId, ord)

  /** FORWARD and NEAREST as-of joins — the other two pandas
    * `merge_asof` directions, same union+one-window-pass scale shape
    * as [[asOfUnion]] (one shuffle+sort per key; the backward and
    * forward carries are two frames over the SAME window ordering, so
    * nearest costs no extra exchange).
    *
    * Direction semantics (deliberate, spec-pinned):
    *  - backward: latest right with `rt <  lt` (asOfUnion's contract);
    *    equal-time ties among rights → GREATEST tiebreak wins.
    *  - forward: earliest right with `rt ≥ lt` (pandas includes the
    *    exact match forward); ties → LEAST tiebreak wins.
    *  - nearest: whichever of the two is closer by |Δt|; equal
    *    distance prefers BACKWARD — except an exact match (Δ=0,
    *    only possible forward) always wins since backward is strict.
    *
    * `tolerance` nulls the payload when the chosen match is farther
    * than `tol` (both directions). Time expressions must be numeric.
    */
  def asOfNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: Column, rightTime: Column,
                  payload: Seq[String], tiebreak: Seq[String],
                  direction: String = "nearest",
                  tolerance: Option[Long] = None): DataFrame = {
    require(Set("forward", "nearest")(direction),
      s"direction must be forward|nearest (backward is asOfUnion), got $direction")
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema
    def nullOf(c: String, from: org.apache.spark.sql.types.StructType) =
      lit(null).cast(from(c).dataType).as(c)

    val lAligned = left
      .select((leftCols.map(col) :+ leftTime.as("_t") :+ lit(0).as("_side")) ++
        (payload ++ tiebreak).distinct.map(c => nullOf(c, rightSchema)): _*)
    val rAligned = right
      .select((leftCols.map(c =>
          if (c == leftKey) col(rightKey).as(c) else nullOf(c, left.schema)) :+
        rightTime.as("_t") :+ lit(1).as("_side")) ++
        (payload ++ tiebreak).distinct.map(col): _*)

    val ord = Window.partitionBy(leftKey)
      .orderBy((col("_t") +: col("_side") +: tiebreak.map(col)): _*)
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightRow = when(col("_side") === 1,
      struct((col("_t").as("_rt") +: payload.map(col)): _*))
    // left (side 0) sorts before equal-time rights ⇒ the backward
    // frame sees only rt < lt, the forward frame includes rt = lt
    val carried = lAligned.unionByName(rAligned)
      .select(leftCols.map(col) :+ col("_side") :+ col("_t") :+
        last(rightRow, ignoreNulls = true).over(wBack).as("_mb") :+
        first(rightRow, ignoreNulls = true).over(wFwd).as("_mf"): _*)
      .filter(col("_side") === 0)
    val db = col("_t") - col("_mb").getField("_rt")
    val df_ = col("_mf").getField("_rt") - col("_t")
    val chosen =
      if (direction == "forward") col("_mf")
      else when(col("_mb").isNull, col("_mf"))
        .when(col("_mf").isNull, col("_mb"))
        .when(db <= df_, col("_mb")).otherwise(col("_mf"))
    val withM = carried.withColumn("_m", chosen)
      .withColumn("_d", abs(col("_t") - col("_m").getField("_rt")))
    val gated = tolerance.fold(withM) { tol =>
      withM.withColumn("_m", when(col("_d") <= tol, col("_m")))
    }
    gated.select(leftCols.map(col) ++
      payload.map(c => col("_m").getField(c).as(c)): _*)
  }
}
