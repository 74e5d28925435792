package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC / upsert merge — the "apply a change stream to a dimension
  * table" operator (SQL MERGE / SCD type 1) that every warehouse-style
  * pipeline needs around the reference's append-only flows.
  */
object Merge {

  /** SCD-1 (latest-wins) merge: reduce `changes` to the newest change
    * per key, then apply it to `base` —
    *
    *  - key in both and latest change is a delete → row dropped;
    *  - key in both otherwise → `updates` target columns overwritten
    *    from the change row;
    *  - key only in changes (insert) → new row; base-only attributes
    *    are NULL, `updates` targets come from the change;
    *  - key only in base → row unchanged;
    *  - delete for an absent key → ignored.
    *
    * Output schema = `base` schema.
    *
    * @param versionCols total order WITHIN a key (include a unique
    *        tiebreaker — ties would make "latest" nondeterministic)
    * @param deleteWhen  predicate over the change columns, evaluated
    *        on the latest change row only (earlier tombstones are
    *        superseded like any other change)
    * @param updates     (baseColumn ← changeColumn) assignments;
    *        change payload names must not collide with base columns
    *
    * Scale shape: the per-key reduction is ONE `max_by` aggregation —
    * partial-aggregable, so each task ships at most one candidate row
    * per key into the shuffle (never a window sort over the change
    * log). The apply step is a single key-equi full-outer join; with a
    * bucketed/pre-partitioned base this is the textbook incremental
    * MERGE at any scale. */
  def scd1(base: DataFrame, changes: DataFrame, key: String,
           versionCols: Seq[String], deleteWhen: Column,
           updates: Seq[(String, String)]): DataFrame = {
    val payload = changes.columns.filterNot(_ == key).toSeq
    require(versionCols.nonEmpty && versionCols.forall(payload.contains),
      "versionCols must be change (non-key) columns")
    require(payload.intersect(base.columns.filterNot(_ == key).toSeq).isEmpty,
      "change payload columns must not collide with base columns")
    require(updates.forall { case (b, c) =>
      base.columns.contains(b) && payload.contains(c) })
    val latest = changes.groupBy(col(key)).agg(
        max_by(struct(payload.map(col): _*),
          struct(versionCols.map(col): _*)).as("_ch"))
      .select(col(key) +:
        payload.map(p => col("_ch").getField(p).as(p)) :+
        lit(true).as("_has_ch"): _*)
    val merged = base.join(latest, Seq(key), "full_outer")
    // null-safe: base-only rows have _has_ch NULL, never deleted
    val dropped = merged.filter(
      !coalesce(col("_has_ch") && deleteWhen, lit(false)))
    updates.foldLeft(dropped) { case (df, (bCol, cCol)) =>
        df.withColumn(bCol,
          when(coalesce(col("_has_ch"), lit(false)), col(cCol))
            .otherwise(col(bCol)))
      }
      .select(base.columns.map(col): _*)
  }

  /** Mergeable-aggregate state from a raw batch — the init step of
    * incremental materialized-view maintenance ([[aggIncrement]]).
    * State rows: (keys..., n, sum_v, min_v, max_v) — every field is
    * a commutative monoid, which is exactly what makes the view
    * refreshable from deltas without ever re-reading history. `n`
    * counts rows; NULL values are ignored by sum/min/max (SQL
    * aggregate semantics). */
  def aggInit(delta: DataFrame, keyCols: Seq[String],
              valueCol: String): DataFrame =
    delta.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"),
      min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"))

  /** Incremental aggregate refresh: fold a raw-row `delta` batch into
    * an [[aggInit]]-shaped `state` and return the refreshed state —
    * the INCREMENTAL VIEW MAINTENANCE step every warehouse refresh
    * job runs. Equal (up to FP summation order) to re-aggregating the
    * concatenated history, but each refresh touches only
    * state + delta.
    *
    * Scale shape: one map-side-combinable agg over the delta, one
    * key-equi union+agg against the state — both partition on the
    * view key, so with the state stored bucketed by key the refresh
    * is co-located and the history-sized recompute never happens.
    * Derived measures (avg = sum_v/n …) are projections of the state,
    * never stored. */
  def aggIncrement(state: DataFrame, delta: DataFrame,
                   keyCols: Seq[String], valueCol: String): DataFrame =
    state.unionByName(aggInit(delta, keyCols, valueCol))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))

  /** Snapshot diff — the inverse of [[scd1]]: given two generations
    * of a table, extract the change set that transforms `old` into
    * `neu` (CDC extraction between snapshots, the "table_changes"
    * every lakehouse exposes). One row per changed key:
    * (keys..., change_type ∈ insert|update|delete, old_c / new_c per
    * attribute). Unchanged keys are dropped; attribute comparison is
    * null-safe (NULL → NULL is "unchanged", NULL → value is a
    * change), so the diff of a table against itself is empty.
    *
    * Scale shape: ONE key-equi full-outer join — co-located when both
    * generations share a bucketed layout (the [[scd1]] /
    * `Scd1Handle` generation files do) — then pure projection; the
    * output is changed-rows-sized, never table-sized. This is the
    * operator that turns a periodic full snapshot feed into an
    * incremental one: diff consecutive snapshots once, then apply the
    * (much smaller) change stream with [[scd1]] from there on. */
  def snapshotDiff(old: DataFrame, neu: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && old.columns.sameElements(neu.columns),
      "snapshots must share one schema; diff keys must be non-empty")
    val valCols = old.columns.filterNot(keyCols.contains).toSeq
    def side(df: DataFrame, p: String, flag: String) =
      df.select(keyCols.map(col) ++ valCols.map(c => col(c).as(p + c)) :+
        lit(true).as(flag): _*)
    val joined = side(old, "old_", "_in_old")
      .join(side(neu, "new_", "_in_new"), keyCols, "full_outer")
    val changed = valCols.map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.withColumn("change_type",
        when(col("_in_old").isNull, lit("insert"))
          .when(col("_in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("change_type")) ++
        valCols.flatMap(c => Seq(col("old_" + c), col("new_" + c))): _*)
  }

  /** SCD type-2 history build: turn a change log into versioned
    * dimension rows with half-open validity intervals
    * `[valid_from, valid_to)` — the other half of warehouse MERGE
    * semantics next to [[scd1]] (which keeps only the latest row,
    * this keeps them all, queryable as-of any time via
    * [[pointInTime]]).
    *
    *  - consecutive log rows whose tracked attributes are unchanged
    *    (null-safely) are COLLAPSED into the open version — a
    *    heartbeat feed doesn't mint spurious versions;
    *  - each kept row opens a version at its time; the version closes
    *    at the NEXT kept row's time; the latest version has
    *    `valid_to` NULL (current row — the SCD-2 convention).
    *
    * Intervals per key partition the timeline from the first change
    * on: no gaps, no overlaps, by construction.
    *
    * Scale shape: two window passes over the SAME
    * (partitionBy key, orderBy ts+tiebreak) spec — one exchange, one
    * sort, the second window rides the first's ordering (Spark elides
    * the redundant exchange/sort). Nothing driver-side, output ≤ log
    * size. At 100 TB the log shuffles once on the dimension key —
    * the same shuffle any per-key sessionization pays.
    *
    * @param tieBreak extra order columns making equal-time changes
    *        deterministic (e.g. a change id) */
  def scd2History(changes: DataFrame, key: String, tsCol: String,
                  attrCols: Seq[String],
                  tieBreak: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(!(attrs <=> col("_prev")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(key) +: attrCols.map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
  }

  /** Point-in-time (temporal) join: each fact row picks up the
    * dimension version valid at its event time — `valid_from ≤ t`,
    * latest such version; the [[scd2History]] half-open-interval
    * contract makes that version also satisfy `t < valid_to`, so no
    * interval predicate is ever evaluated.
    *
    * Scale shape: delegates to [[AsOfJoin.asOfUnion]] — ONE
    * union+window pass, no range/theta join, no per-fact probe of the
    * history table. A BETWEEN-interval formulation forces a range
    * join (nested-loop in Spark); as-of is the scalable plan for
    * timeline-partitioning intervals. Times must be numeric (e.g.
    * epoch micros): the +1 tick turns asOfUnion's strictly-before
    * into SCD-2's at-or-before inclusive start.
    *
    * Facts before the key's first version (or with no history key)
    * keep NULL versions — left-join semantics. */
  def pointInTime(facts: DataFrame, history: DataFrame, key: String,
                  factTime: Column, payload: Seq[String]): DataFrame =
    AsOfJoin.asOfUnion(
      facts, history, key, key,
      factTime + lit(1L), col("valid_from"),
      payload :+ "valid_from", tiebreak = Seq("valid_from"))

  /** Golden-record survivorship: one row per key whose EVERY
    * attribute is the most recent NON-NULL observation of that
    * attribute — column-level survivorship (MDM "most recent wins,
    * but never overwrite data with a gap"), vs [[scd1]]'s row-level
    * latest. Attributes may win from DIFFERENT source rows.
    *
    * Scale shape: ONE map-side-combinable aggregation —
    * `max_by(attr, version) FILTER (WHERE attr IS NOT NULL)` per
    * attribute — so each task ships one candidate value per
    * (key, attribute) into the shuffle. The window formulation
    * (`last_value IGNORE NULLS` + dropDuplicates) sorts every
    * group; this never sorts.
    *
    * @param versionCols total order within a key (include a unique
    *        tiebreaker) */
  def goldenRecord(rows: DataFrame, keyCol: String,
                   versionCols: Seq[String],
                   attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty && versionCols.nonEmpty)
    val ord = s"struct(${versionCols.mkString(", ")})"
    val aggs = attrCols.map(a =>
      expr(s"max_by($a, $ord) FILTER (WHERE $a IS NOT NULL)").as(a))
    rows.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental maintenance of a JOIN-AGGREGATE view (insert-only
    * IVM): with V = γ(A ⋈ B), an insert batch updates it as
    * `V' = V ⊎ γ(ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB)` — the three delta terms touch
    * only delta-sized join inputs, never re-scanning A⋈B. This is
    * [[aggIncrement]]'s join-view sibling: the identity every
    * materialized-view engine implements, expressed as a plain plan
    * so its result is provably (oracle-checked) equal to the full
    * recompute. `view` stands for the STORED aggregate (in
    * production it is read, not computed); `baseA`/`baseB` feed only
    * the cross terms.
    *
    * Scale shape: ΔA⋈B and A⋈ΔB are delta-driven joins — with B's
    * key layout bucketed/broadcast these cost |Δ|, not |A|; the
    * merge is a per-group sum of two aggregate relations
    * (group-key-sized, not row-sized). Deletes/updates compose the
    * same way with signed counts. */
  def incrementalJoinAgg(view: DataFrame, baseA: DataFrame,
                         deltaA: DataFrame, baseB: DataFrame,
                         deltaB: DataFrame, aKey: String, bKey: String,
                         groupCol: String, valCol: Column): DataFrame = {
    def agg(a: DataFrame, b: DataFrame) =
      a.join(b, a(aKey) === b(bKey))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n"), sum(valCol).as("val"))
    val delta = agg(deltaA, baseB)
      .unionAll(agg(baseA, deltaB)).unionAll(agg(deltaA, deltaB))
      .groupBy(col(groupCol))
      .agg(sum("n").as("n"), sum("val").as("val"))
    view.unionAll(delta)
      .groupBy(col(groupCol))
      .agg(sum("n").as("n"), sum("val").as("val"))
  }

  /** Merkle-style anti-entropy diff: bucket both table versions by
    * id-hash, fold each bucket to an order-free XOR content checksum
    * (the [[graft.operators.Curation.outputManifest]] recipe), and
    * report per-bucket status — the sync primitive that finds WHERE
    * two replicas/snapshots differ while shipping only
    * buckets-many checksums, not rows. Returns non-matching buckets
    * only: (bucket, n_a, n_b, status ∈ diff|a_only|b_only); equal
    * tables return zero rows.
    *
    * Scale shape: each side is one map-side-combinable bucket agg;
    * the compare is a buckets-sized full join. Drill-down = re-run
    * on a changed bucket with more buckets (the Merkle descent),
    * each level paying one scan of the SUSPECT range only. */
  def merkleDiff(a: DataFrame, b: DataFrame, idCol: String,
                 payloadCol: Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    import graft.functions.HashFunctions.md5Long
    def side(df: DataFrame, np: String, cp: String) = df
      .select((md5Long(col(idCol).cast("string")) % buckets).as("bucket"),
        md5Long(concat(col(idCol).cast("string"), lit(":"),
          payloadCol.cast("string"))).as("_h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(np),
        expr("bit_xor(_h)").as(cp))
    side(a, "n_a", "_ca").join(side(b, "n_b", "_cb"), Seq("bucket"), "full")
      .withColumn("status",
        when(col("_ca").isNull, "b_only")
          .when(col("_cb").isNull, "a_only")
          .when(col("_ca") =!= col("_cb") || col("n_a") =!= col("n_b"),
            "diff"))
      .filter(col("status").isNotNull)
      .select(col("bucket"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("status"))
  }
}
