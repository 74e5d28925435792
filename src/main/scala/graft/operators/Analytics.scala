package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics operators — ordered-funnel conversion and cohort
  * retention, the two queries every event warehouse runs daily. Both
  * are pure declarative plans over the raw event log: no sessionizing
  * precompute, no driver-side state, integer outputs that hash
  * identically on any engine.
  */
object Analytics {

  /** Ordered funnel: for each step k, the number of users who
    * performed step 1..k IN ORDER (each step strictly AFTER the
    * previous one — a same-timestamp event does not advance the
    * funnel, so the result is order-of-arrival independent), with an
    * optional per-step conversion window: when `maxGap` is set, step
    * k must land within `maxGap` time units of the user's step-(k-1)
    * time (the product-analytics "converted within N hours" contract;
    * units are whatever `tsCol` carries). Returns one row per step:
    * (step, step_name, n_users), n_users non-increasing by
    * construction.
    *
    * Scale shape: per step, one filter on the event scan (pushed to
    * the source) and one key-equi join + min-agg against the previous
    * stage's (user, ts) table — all joins and aggs share the user-key
    * partitioning, so after the first shuffle the per-step passes are
    * co-located; AQE reuses the exchange. Stage tables only ever
    * SHRINK (stage k ⊆ stage k-1), so later passes are cheaper, and
    * the final counts are 1-row aggregates unioned into a k-row
    * result — nothing wide ever reaches the driver. The number of
    * steps is a query constant (3–6 in practice), not data-driven. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxGap: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel steps must be non-empty and distinct, got $steps")
    val ev = events.select(col(userCol).as("_user"), col(tsCol).as("_ts"),
      col(typeCol).as("_tpe"))
    funnelStages(ev, steps, maxGap).zipWithIndex.map { case (stage, i) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Shared funnel stage builder: element i is the per-user
    * (first qualifying step-(i+1) time `_t`, previous-step time
    * `_prev` — absent for the entry step) table. Stage tables only
    * ever SHRINK; see [[funnel]] for the step semantics. */
  private def funnelStages(ev: DataFrame, steps: Seq[String],
                           maxGap: Option[Long]): Seq[DataFrame] = {
    val first = ev.filter(col("_tpe") === steps.head)
      .groupBy("_user").agg(min("_ts").as("_t"))
    steps.indices.drop(1).foldLeft(Vector(first)) { (acc, i) =>
      val prev = acc.last.select(col("_user"), col("_t").as("_prev"))
      acc :+ ev.filter(col("_tpe") === steps(i))
        .join(prev, Seq("_user"))
        .filter(maxGap.foldLeft(col("_ts") > col("_prev")) {
          (p, g) => p && col("_ts") <= col("_prev") + lit(g) })
        // _prev is constant per user (the join key's single previous
        // time); min() just carries it through the aggregate
        .groupBy("_user").agg(min("_ts").as("_t"), min("_prev").as("_prev"))
    }
  }

  /** Funnel step latency: for each non-entry step, over the users who
    * converted, the count and the median / p90 of the time from the
    * previous step (same units as `tsCol`; rounded to 1). The
    * "where does the funnel stall" diagnostic that pairs with
    * [[funnel]]'s "where does it leak". Same stage semantics and
    * `maxGap` window as [[funnel]] — the two reports always agree.
    *
    * Scale shape: identical to [[funnel]] (shrinking user-key
    * join/agg passes) plus one exact percentile per step over the
    * CONVERTED-users deltas — step-table-sized sorts, never the
    * event log. */
  def funnelStepLatency(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, steps: Seq[String],
                        maxGap: Option[Long] = None): DataFrame = {
    require(steps.size >= 2 && steps.distinct == steps,
      s"need ≥ 2 distinct funnel steps, got $steps")
    val ev = events.select(col(userCol).as("_user"), col(tsCol).as("_ts"),
      col(typeCol).as("_tpe"))
    funnelStages(ev, steps, maxGap).zipWithIndex.drop(1).map {
      case (stage, i) =>
        stage.select((col("_t") - col("_prev")).cast("double").as("_delta"))
          .agg(count(lit(1)).as("n_users"),
            round(expr("percentile(_delta, 0.5)"), 1).as("med_us"),
            round(expr("percentile(_delta, 0.9)"), 1).as("p90_us"))
          .select(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
            col("n_users"), col("med_us"), col("p90_us"))
    }.reduce(_.unionByName(_))
  }

  /** Top event paths: the `topK` most frequent length-`pathLen`
    * consecutive `typeCol` sequences across users (order-n sequence
    * mining, the "what do users actually do" report). Ties at the
    * cut break by the path itself, so the K-th row is deterministic.
    *
    * Scale shape: one user-partitioned window pass materializing the
    * n-gram columns via `lead` (n is a query constant), one
    * paths-cardinality aggregation (≤ types^n groups), and a
    * TakeOrderedAndProject top-K — never a full sort. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               orderCols: Seq[Column], pathLen: Int = 3,
               topK: Int = 20): DataFrame = {
    require(pathLen >= 2 && topK >= 1 && orderCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCols: _*)
    val cols = (0 until pathLen).map(i =>
      (if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
        .as(s"t${i + 1}"))
    events.filter(col(userCol).isNotNull).select(cols: _*)
      .filter((1 until pathLen).map(i => col(s"t${i + 1}").isNotNull)
        .reduce(_ && _))
      .groupBy((1 to pathLen).map(i => col(s"t$i")): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc +: (1 to pathLen).map(i => col(s"t$i")): _*)
      .limit(topK)
  }

  /** Cohort retention matrix: users are cohorted by the period of
    * their FIRST event; each (cohort, offset) cell counts the
    * distinct users of that cohort active `offset` periods later.
    * Periods are epoch-aligned fixed buckets of `periodUs`
    * microseconds over a µs-integer time column (default 7 days) —
    * integer division end to end, so every cell is engine-exact.
    * Returns (cohort_period, period_offset, n_users); offset 0 row
    * is the cohort size.
    *
    * Scale shape: one min-agg per user (map-side combinable), one
    * key-equi join back to the event log — both sides partitioned by
    * user, so the join is co-located with the agg's own shuffle — and
    * one final (cohort, offset) count-distinct whose group count is
    * tiny (periods², not users). The first-event table is users-sized;
    * at 100 TB it is the ONLY intermediate, and it is the small side:
    * broadcast it when the user dimension fits, else the co-partitioned
    * join above. */
  /** Rolling active users — DAU/WAU/MAU: for each period, the count
    * of distinct users active in the trailing `windowPeriods` periods
    * (inclusive). Periods are epoch-aligned `periodUs` buckets;
    * output is trimmed to the data's own period range so every
    * reported window is fully inside the feed. Returns
    * (period, n_active).
    *
    * Scale shape: the event log first collapses to DISTINCT
    * (user, period) — users × periods sized, the only table that
    * matters — then each activity row is exploded to the ≤ `window`
    * periods it keeps alive (`sequence` + `explode`, a fixed ≤ 28×
    * fan-out of the ALREADY-collapsed table, not of the raw log) and
    * one count-distinct per period closes it. No window function, no
    * per-period self-join — the rolling semantics ride the explode.
    * For window sizes where w× distinct-activity fan-out is too much,
    * swap the exact count-distinct for the mergeable HLL aggregate
    * ([[graft.plans.HllAgg]]) over the same explode. */
  def rollingActiveUsers(events: DataFrame, userCol: String,
                         tsUsCol: String, periodUs: Long,
                         windowPeriods: Int): DataFrame = {
    require(periodUs >= 1 && windowPeriods >= 1)
    val up = events.select(col(userCol).as("_user"),
        expr(s"cast($tsUsCol as bigint) div $periodUs").as("_p"))
      .filter(col("_user").isNotNull).distinct()
    // data's own period range via a 1-row broadcast, never a collect
    val mx = broadcast(up.agg(max("_p").as("_maxp")))
    up.select(col("_user"),
        explode(sequence(col("_p"),
          col("_p") + lit(windowPeriods - 1L))).as("period"))
      .crossJoin(mx).filter(col("period") <= col("_maxp"))
      .groupBy("period")
      .agg(countDistinct(col("_user")).as("n_active"))
  }

  /** Next-event transition matrix (first-order Markov estimate): for
    * each ordered (src_type, dst_type) pair of consecutive events of
    * one user, the transition count and the row-normalized
    * probability. `orderCols` must be a TOTAL order per user (pass a
    * unique tiebreak — same contract as every rank/argmax here) or
    * the pairs are engine-dependent. Returns
    * (src_type, dst_type, n, p) with p rounded to 6.
    *
    * Scale shape: one user-partitioned window (lag) over the event
    * log — the same single shuffle any sessionization pays — then a
    * types²-sized aggregation; the row-normalizing sum is a window
    * over that tiny table, not over events. Integer counts divide
    * exactly on both engines, so p is oracle-stable at round-6. */
  def eventTransitions(events: DataFrame, userCol: String,
                       typeCol: String,
                       orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "need a per-user total order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCols: _*)
    val pairs = events.filter(col(userCol).isNotNull)
      .select(col(typeCol).as("dst_type"),
        lag(col(typeCol), 1).over(w).as("src_type"))
      .filter(col("src_type").isNotNull)
    val counts = pairs.groupBy("src_type", "dst_type")
      .agg(count(lit(1)).as("n"))
    val norm = org.apache.spark.sql.expressions.Window
      .partitionBy("src_type")
    counts.withColumn("p",
        round(col("n").cast("double") / sum("n").over(norm), 6))
      .select("src_type", "dst_type", "n", "p")
  }

  /** Last-touch attribution: each conversion event is credited to the
    * `typeCol` of the user's latest PRECEDING non-conversion event
    * (strictly earlier in the `orderCols` total order), or to
    * `"direct"` when there is none — optionally none within
    * `lookback` time units. Returns (channel, n_conversions).
    *
    * Scale shape: ONE user-partitioned window pass (the sessionize
    * shuffle) carrying the last non-conversion (time, type) struct —
    * both fields from the SAME row via ignoreNulls-over-struct, so
    * the credited channel and its staleness check can never disagree
    * — then a channels-sized count. No self-join of conversions
    * against touches (the candidate-explosion shape this replaces). */
  def lastTouchAttribution(events: DataFrame, userCol: String,
                           tsCol: String, typeCol: String,
                           conversion: String, orderCols: Seq[Column],
                           lookback: Option[Long] = None): DataFrame = {
    require(orderCols.nonEmpty, "need a per-user total order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = last(
      when(col(typeCol) =!= conversion,
        struct(col(tsCol).as("_tt"), col(typeCol).as("_tc"))),
      ignoreNulls = true).over(w)
    val stale = lookback.map(lb =>
      col(tsCol) - col("_lt").getField("_tt") > lb).getOrElse(lit(false))
    events.filter(col(userCol).isNotNull)
      .withColumn("_lt", touch)
      .filter(col(typeCol) === conversion)
      .select(when(col("_lt").isNull || stale, lit("direct"))
        .otherwise(col("_lt").getField("_tc")).as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("n_conversions"))
  }

  /** In-session co-occurrence lift (market-basket over sessions):
    * for each unordered pair of event types, how much more often
    * they share a gap-bounded session than independence predicts —
    * lift = P(t1,t2) / (P(t1)·P(t2)) over sessions, reported with
    * the raw session counts. Lift > 1 = the behaviors travel
    * together; < 1 = they repel. Sessions are `gapUs`-gap bounded
    * (q34's arithmetic) under the caller's per-user total order.
    *
    * Scale shape: the sessionization window (one user-keyed
    * shuffle), a distinct (user, session, type) collapse, then a
    * SESSION-keyed self-join whose fan-out is Σ types-per-session²
    * — bounded by the type vocabulary, not by session length — and
    * types²-sized arithmetic with one broadcast scalar. */
  def sessionBasketLift(events: DataFrame, userCol: String,
                        tsUsCol: String, orderCols: Seq[Column],
                        typeCol: String,
                        gapUs: Long = 1800000000L): DataFrame = {
    require(orderCols.nonEmpty && gapUs >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(orderCols: _*)
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val m = events.filter(col(userCol).isNotNull)
      .withColumn("_new",
        when(lag(col(tsUsCol), 1).over(w).isNull ||
          col(tsUsCol) - lag(col(tsUsCol), 1).over(w) > gapUs, 1)
          .otherwise(0))
      .withColumn("_sid", sum("_new").over(wRun))
      .select(col(userCol), col("_sid"), col(typeCol).as("_t")).distinct()
    val ns = broadcast(m.select(col(userCol), col("_sid")).distinct()
      .agg(count(lit(1)).as("_ns")))
    val single = m.groupBy("_t").agg(count(lit(1)).as("_c"))
    val pairs = m.select(col(userCol), col("_sid"), col("_t").as("t1"))
      .join(m.select(col(userCol), col("_sid"), col("_t").as("t2")),
        Seq(userCol, "_sid"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
    pairs
      .join(single.select(col("_t").as("t1"), col("_c").as("c1")), Seq("t1"))
      .join(single.select(col("_t").as("t2"), col("_c").as("c2")), Seq("t2"))
      .crossJoin(ns)
      .select(col("t1"), col("t2"), col("c12"), col("c1"), col("c2"),
        round(col("c12").cast("double") * col("_ns") /
          (col("c1") * col("c2")), 6).as("lift"))
  }

  /** Gini concentration index per group over per-unit totals:
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with x ascending (0 = perfect
    * equality, →1 = one unit holds everything) — the "how
    * concentrated is spend/traffic/token-mass" diagnostic. Unit
    * totals are ROUNDED (4) before ranking so the rank order —
    * which the statistic depends on — can't flip on cross-engine
    * low-bit summation noise; ties break by the unit key.
    *
    * Scale shape: one unit-level agg, one group-partitioned rank
    * (group-sized sorts), one group-sized reduction. The units
    * table (dimension-sized) is the largest thing ranked. */
  def giniIndex(df: DataFrame, groupCol: String, unitCol: String,
                valueCol: String): DataFrame = {
    val x = df.filter(col(unitCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(unitCol))
      .agg(round(sum(col(valueCol)), 4).as("_xr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_xr"), col(unitCol))
    x.withColumn("_i", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(lit(2.0) * sum(col("_i") * col("_xr")) /
            (count(lit(1)) * sum(col("_xr"))) -
          (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
  }

  /** Two-proportion A/B read-out: one row —
    * (na, ka, nb, kb, lift, z) — from unit-level (treatment,
    * converted) rows: lift = p_B − p_A and the pooled two-proportion
    * z statistic (|z| > 1.96 ≈ 95% significance). Counts are exact
    * integers, so every derived ratio is computed from identical
    * operands on any engine.
    *
    * Scale shape: one map-side-combinable 2-group aggregate and a
    * 1-row pivot — nothing here is ever big; the caller's
    * unit-building aggregation (events → units) is the only
    * data-sized pass, and it's a plain keyed agg. */
  def abLift(units: DataFrame, treatmentCol: Column,
             convCol: Column): DataFrame = {
    val s = units.select(treatmentCol.as("_t"),
        convCol.cast("long").as("_c"))
      .groupBy("_t").agg(count(lit(1)).as("_n"), sum("_c").as("_k"))
    val w = s.agg(
      max(when(!col("_t"), col("_n"))).as("na"),
      max(when(!col("_t"), col("_k"))).as("ka"),
      max(when(col("_t"), col("_n"))).as("nb"),
      max(when(col("_t"), col("_k"))).as("kb"))
    val (na, ka, nb, kb) = (col("na").cast("double"),
      col("ka").cast("double"), col("nb").cast("double"),
      col("kb").cast("double"))
    val pPool = (ka + kb) / (na + nb)
    val diff = kb / nb - ka / na
    w.select(col("na"), col("ka"), col("nb"), col("kb"),
      round(diff, 6).as("lift"),
      round(diff / sqrt(pPool * (lit(1.0) - pPool) *
        (lit(1.0) / na + lit(1.0) / nb)), 5).as("z"))
  }

  /** Pairwise audience overlap: for every unordered pair of sets
    * (t1 < t2), the exact intersection, union, and Jaccard of their
    * element sets. The exact counterpart of the HLL overlap
    * estimator ([[Sketches.hllOverlap]]) — use THIS while the
    * element-pair matrix fits (sets² · shared-element rows), the
    * sketch when it doesn't.
    *
    * Scale shape: one distinct (set, element) collapse, one
    * element-keyed self-join expanding co-membership pairs (linear
    * in Σ_element deg² — bounded when membership per element is),
    * and set-sized joins for the union term. */
  def audienceOverlap(df: DataFrame, setCol: String,
                      elemCol: String): DataFrame = {
    val a = df.filter(col(setCol).isNotNull && col(elemCol).isNotNull)
      .select(col(setCol).as("_t"), col(elemCol).as("_u")).distinct()
    val pairs = a.select(col("_t").as("t1"), col("_u"))
      .join(a.select(col("_t").as("t2"), col("_u")), Seq("_u"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_inter"))
    val sz = a.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    pairs
      .join(sz.select(col("_t").as("t1"), col("_n").as("_n1")), Seq("t1"))
      .join(sz.select(col("_t").as("t2"), col("_n").as("_n2")), Seq("t2"))
      .select(col("t1"), col("t2"), col("n_inter"),
        (col("_n1") + col("_n2") - col("n_inter")).as("n_union"),
        round(col("n_inter").cast("double") /
          (col("_n1") + col("_n2") - col("n_inter")), 6).as("jaccard"))
  }

  /** RFM segmentation: per key, recency (periods since last event,
    * against the feed's own max time), frequency (event count),
    * monetary (value sum, rounded 4), each scored into `nTiles`
    * quantile tiles (5 = best: most recent / most frequent / highest
    * spend), plus the concatenated segment label — the classic
    * customer-value cube. Tile assignment uses `ntile` with the key
    * as tiebreak, so every score is engine-deterministic.
    *
    * Scale shape: one map-side-combinable agg per key, a 1-row
    * broadcast for the feed max, then ntile windows over the
    * KEY-sized table (dimension-sized, not event-sized). For key
    * counts past one sort task, swap ntile for broadcast
    * histogram-quantile cutoffs ([[Sketches]], q53) — same scores,
    * no global sort. */
  def rfmSegments(events: DataFrame, keyCol: String, tsUsCol: String,
                  valueCol: String, nTiles: Int = 5,
                  periodUs: Long = 86400000000L): DataFrame = {
    require(nTiles >= 2 && periodUs >= 1)
    val p = events.filter(col(keyCol).isNotNull)
      .select(col(keyCol), col(tsUsCol).cast("long").as("_tu"),
        col(valueCol).as("_v"))
    val mx = broadcast(p.agg(max("_tu").as("_mt")))
    val base = p.groupBy(col(keyCol))
      .agg(max("_tu").as("_lt"), count(lit(1)).as("f"),
        round(sum("_v"), 4).as("m"))
      .crossJoin(mx)
      .select(col(keyCol), expr(s"(_mt - _lt) div ${periodUs}L").as("r_days"),
        col("f"), col("m"))
    def tile(o: Column*) = ntile(nTiles)
      .over(org.apache.spark.sql.expressions.Window.orderBy(o: _*))
    base
      .withColumn("r_score", tile(col("r_days").desc, col(keyCol)))
      .withColumn("f_score", tile(col("f"), col(keyCol)))
      .withColumn("m_score", tile(col("m"), col(keyCol)))
      .withColumn("segment",
        concat_ws("-", col("r_score"), col("f_score"), col("m_score")))
  }

  /** Linear (equal-credit) multi-touch attribution: each conversion
    * splits one unit of credit equally across ALL the user's
    * non-conversion touches in the trailing `lookbackUs` window
    * (exclusive of the conversion instant); a touchless conversion
    * credits `direct` in full. Returns (channel, credit rounded 6) —
    * total credit always equals the conversion count. The fairness
    * complement to [[lastTouchAttribution]]'s winner-takes-all.
    *
    * Scale shape: ONE user-partitioned RANGE-frame window collects
    * each conversion's touch list (frame bounded by the lookback, so
    * carried state per row is the window's own touches, not history),
    * then an explode sized by conversions × touches-per-conversion
    * and a channels-sized sum. Same single shuffle as sessionization;
    * no conversion×touch self-join. */
  def linearAttribution(events: DataFrame, userCol: String,
                        tsUsCol: String, typeCol: String,
                        conversion: String, lookbackUs: Long): DataFrame = {
    require(lookbackUs >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsUsCol).cast("long"))
      .rangeBetween(-lookbackUs, -1)
    // collect_list drops the nulls the `when` leaves on conversions
    // and off-channel rows — the frame's list IS the touch set
    val conv = events.filter(col(userCol).isNotNull)
      .withColumn("_touches",
        collect_list(when(col(typeCol) =!= conversion, col(typeCol))).over(w))
      .filter(col(typeCol) === conversion)
      .select(col("_touches"), size(col("_touches")).as("_n"))
    val direct = conv.filter(col("_n") === 0)
      .select(lit("direct").as("channel"), lit(1.0).as("_credit"))
    val spread = conv.filter(col("_n") > 0)
      .select(explode(col("_touches")).as("channel"),
        (lit(1.0) / col("_n")).as("_credit"))
    direct.unionByName(spread)
      .groupBy("channel").agg(round(sum("_credit"), 6).as("credit"))
  }

  /** Grouped ordinary-least-squares fit of y on x: per group,
    * (slope, intercept, r2, n), each statistic rounded to 5. TWO-PASS
    * centered sums — group means are broadcast back and products are
    * centered before summing — because the one-pass raw-moment form
    * (n·Σxy − ΣxΣy) catastrophically cancels whenever the means dwarf
    * the spreads (timestamps as x: epoch ≈ 1.7e18, spread ≈ 1e15),
    * amplifying FP-order noise past any rounding (q93's lesson).
    *
    * Scale shape: two passes over the input (means, then centered
    * sums), both map-side-combinable aggs on the group key; the means
    * table is groups-sized and broadcast, so the second pass adds no
    * shuffle beyond its own aggregation. Rows with NULL x or y are
    * excluded (SQL REGR_* convention). */
  def groupedLinearFit(df: DataFrame, groupCols: Seq[String],
                       x: Column, y: Column): DataFrame = {
    require(groupCols.nonEmpty)
    val base = df.select(groupCols.map(col) :+ x.as("_x") :+ y.as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    val means = broadcast(base.groupBy(groupCols.map(col): _*)
      .agg(avg("_x").as("_mx"), avg("_y").as("_my")))
    val dx = col("_x") - col("_mx")
    val dy = col("_y") - col("_my")
    base.join(means, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(dx * dy).as("_sxy"), sum(dx * dx).as("_sxx"),
        sum(dy * dy).as("_syy"), count(lit(1)).as("n"),
        max("_mx").as("_fmx"), max("_my").as("_fmy"))
      .select(groupCols.map(col) ++ Seq(
        round(col("_sxy") / col("_sxx"), 5).as("slope"),
        round(col("_fmy") - col("_sxy") / col("_sxx") * col("_fmx"), 5)
          .as("intercept"),
        round(col("_sxy") * col("_sxy") / (col("_sxx") * col("_syy")), 5)
          .as("r2"),
        col("n")): _*)
  }

  def cohortRetention(events: DataFrame, userCol: String, tsUsCol: String,
                      periodUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    require(periodUs >= 1)
    // integer `div` (not `/`, which is double division in Spark SQL):
    // epochs are non-negative, so div == floor division on both engines
    val ev = events.select(col(userCol).as("_user"),
      col(tsUsCol).cast("long").as("_us"))
      .select(col("_user"), expr(s"_us div $periodUs").as("_period"))
    val firsts = ev.groupBy("_user").agg(min("_period").as("cohort_period"))
    ev.join(firsts, Seq("_user"))
      .groupBy(col("cohort_period"),
        (col("_period") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col("_user")).as("n_users"))
  }

  /** 2-D Pareto skyline per group: the rows not DOMINATED by any
    * other row of their group, where `b` dominates `a` iff
    * `b.x ≤ a.x ∧ b.y ≤ a.y` with at least one strict — the
    * "cheapest-and-earliest frontier" query (minimize both axes;
    * negate a column upstream to maximize it). Duplicate frontier
    * points all survive (identical points never dominate each other).
    *
    * Scale shape: the quadratic NOT-EXISTS formulation (the oracle
    * dual) compares every row pair; this plan instead collapses to
    * one candidate per (group, x) via a map-side min(y) agg, runs the
    * classic sort-sweep (running min(y) over strictly-cheaper x) on
    * that collapsed table with ONE window pass, and joins the
    * x-distinct-sized frontier back — work is n log n per group,
    * never n². */
  def skyline2D(df: DataFrame, groupCols: Seq[String], xCol: String,
                yCol: String): DataFrame = {
    val keys = groupCols.map(col) :+ col(xCol)
    val pp = df.groupBy(keys: _*).agg(min(col(yCol)).as("_md"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(xCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val frontier = pp.withColumn("_pm", min(col("_md")).over(w))
      .filter(col("_pm").isNull || col("_pm") > col("_md"))
      .drop("_pm")
    df.join(frontier, groupCols :+ xCol)
      .filter(col(yCol) === col("_md"))
      .drop("_md")
  }

  /** Out-of-fold (K-fold) target encoding table: for each
    * (category, fold), the smoothed mean of the target over every row
    * of that category OUTSIDE the fold — the leakage-safe categorical
    * encoding for model features (a row never sees its own fold's
    * targets, so the encoding can't memorize its label).
    *
    *   enc(c, f) = (Σ_{c,¬f} t + m · prior_f) / (n_{c,¬f} + m)
    *   prior_f   = mean of t outside fold f (the no-data fallback;
    *               a category entirely inside one fold encodes to
    *               exactly prior_f)
    *
    * `targetQ` must be an INTEGER-quantized target (e.g.
    * `floor(t·1e6 + ½)`): the cross-category sums are then exact
    * longs, so the final few double ops have identical operands on
    * any engine and any partitioning — a raw double target would
    * make the encoding summation-order-dependent.
    *
    * Scale shape: ONE map-side-combinable agg over the log to the
    * (categories × folds)-sized table; category/fold/global totals
    * re-aggregate THAT table, never the log. Join the result back to
    * rows on (category, fold) — broadcastable at any realistic
    * cardinality. `unscale` divides the quantized sums back
    * (pass 1e6 for the floor(·1e6) convention). */
  def targetEncodeOOF(rows: DataFrame, catCol: String, foldCol: String,
                      targetQ: Column, smoothing: Long,
                      unscale: Double): DataFrame = {
    require(smoothing > 0, "smoothing must be positive (no-data fallback)")
    val cf = rows.groupBy(col(catCol), col(foldCol))
      .agg(count(lit(1)).as("_n_cf"), sum(targetQ).as("_s_cf"))
    val c = cf.groupBy(col(catCol))
      .agg(sum("_n_cf").as("_n_c"), sum("_s_cf").as("_s_c"))
    val g = cf.groupBy(col(foldCol))
      .agg(sum("_n_cf").as("_n_f"), sum("_s_cf").as("_s_f"))
      .crossJoin(broadcast(
        cf.agg(sum("_n_cf").as("_n_g"), sum("_s_cf").as("_s_g"))))
      .withColumn("_prior",
        (col("_s_g") - col("_s_f")) / unscale / (col("_n_g") - col("_n_f")))
    cf.join(broadcast(c), Seq(catCol)).join(broadcast(g), Seq(foldCol))
      .withColumn("enc",
        ((col("_s_c") - col("_s_cf")) / unscale +
          lit(smoothing) * col("_prior")) /
          (col("_n_c") - col("_n_cf") + lit(smoothing)))
      .select(col(catCol), col(foldCol), col("enc"))
  }

  /** Kaplan–Meier survival curve per group: for each distinct
    * duration t, the at-risk count, event count, and the product-limit
    * survival estimate S(t) = Π_{u ≤ t} (1 − d_u/n_u) — the
    * censoring-aware churn/retention read-out ([[cohortRetention]]
    * ignores censoring; KM is what makes short-lived recent cohorts
    * comparable to old ones). Censored rows (observed = false) leave
    * the at-risk set without contributing an event, exactly the
    * standard estimator.
    *
    * Determinism: d and n are integers; each factor (1 − d/n) is
    * computed from identical int64 operands on any engine, and the
    * running Σln rides ONE ordered window (distinct t per row → a
    * unique order). A group whose risk set dies out entirely
    * (d = n > 0) pins S = 0 from that t on via an integer flag — no
    * ln(0) is ever evaluated (engines disagree on ln(0)).
    *
    * Scale shape: one (group, t) shuffle with map-side combine, a
    * groups-sized broadcast of totals, and two frames over one
    * group-partitioned window sort. Nothing global; survival curves
    * are (group × distinct-t)-sized. */
  def kaplanMeier(df: DataFrame, groupCol: String, durCol: String,
                  observedCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && col(durCol).isNotNull)
      .select(col(groupCol).as("_g"), col(durCol).as("_t"),
        when(observedCol, lit(1L)).otherwise(lit(0L)).as("_d"))
    val c = base.groupBy("_g", "_t")
      .agg(sum("_d").as("_d"), count(lit(1)).as("_c"))
    val tot = c.groupBy("_g").agg(sum("_c").as("_tot"))
    val w = Window.partitionBy("_g").orderBy("_t")
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    val upto = w.rowsBetween(Window.unboundedPreceding, 0)
    val lnFactor = when(col("_d") > 0 && col("_d") < col("n_risk"),
      log(lit(1.0) - col("_d").cast("double") / col("n_risk").cast("double")))
      .otherwise(lit(0.0))
    val extinct = when(col("_d") === col("n_risk") && col("_d") > 0, 1)
      .otherwise(0)
    c.join(broadcast(tot), Seq("_g"))
      .withColumn("n_risk",
        col("_tot") - coalesce(sum("_c").over(prev), lit(0L)))
      .withColumn("_ls", sum(lnFactor).over(upto))
      .withColumn("_z", max(extinct).over(upto))
      .select(col("_g").as(groupCol), col("_t").as(durCol),
        col("n_risk"), col("_d").as("n_events"),
        when(col("_z") === 1, lit(0.0))
          .otherwise(round(exp(col("_ls")), 6)).as("survival"))
  }

  /** ROC AUC per group via the rank-sum (Mann–Whitney) identity:
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum of
    * average ranks of the positive class — the classifier-quality
    * read-out with exact tie handling (ties score ½), no curve
    * sweep, no binning. Equivalently P(score⁺ > score⁻) + ½P(=).
    *
    * EXACT, not just deterministic: pass an integer-quantized score
    * (e.g. cents). Every average rank is k + (c+1)/2 — a half-integer
    * — so R⁺ accumulates in halves, exactly representable and
    * order-independent below 2⁵² (≈ 2·10¹⁵, i.e. n² for 45M rows per
    * group); the single division per group sees identical operands on
    * any engine. Groups missing a class are dropped (AUC undefined).
    *
    * Scale shape: one (group, score) shuffle with map-side combine,
    * ranks via a window sorted WITHIN each group only, then one
    * map-side-combinable group agg. Nothing global. */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: Column,
                 positiveCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && scoreCol.isNotNull)
      .select(col(groupCol).as("_g"), scoreCol.cast("long").as("_s"),
        when(positiveCol, lit(1L)).otherwise(lit(0L)).as("_y"))
    val c = base.groupBy("_g", "_s")
      .agg(sum("_y").as("_pos"), count(lit(1)).as("_cnt"))
    val prev = Window.partitionBy("_g").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    c.withColumn("_rank",
        coalesce(sum("_cnt").over(prev), lit(0L)) +
          (col("_cnt") + 1) / lit(2.0))
      .groupBy(col("_g").as(groupCol))
      .agg(sum("_pos").as("n_pos"),
        (sum("_cnt") - sum("_pos")).as("n_neg"),
        sum(col("_pos") * col("_rank")).as("_rpos"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        round((col("_rpos") - col("n_pos") * (col("n_pos") + 1) / lit(2.0)) /
          (col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"))
  }

  /** EXACT weighted median per group (lower median): the smallest
    * value whose running weight reaches half the group's total —
    * robust central tendency where every row carries a mass
    * (quantity-weighted price, token-weighted score). Unlike
    * percentile sketches this is exact and deterministic: ties are
    * broken by the caller's `tiebreak` columns.
    *
    * Scale shape: ONE shuffle on the group key feeding two window
    * passes over the same partitioning (running weight + group
    * total), then a map-side-combinable min/max agg. The `·2 ≥ total`
    * test is integer arithmetic when the weight column is integral —
    * cast it; no FP boundary ambiguity cross-engine. Groups must fit
    * a window partition each; for a GLOBAL weighted median at 100 TB
    * use [[Sketches.histQuantiles]] instead (documented trade:
    * exactness for unbounded scale). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String, tiebreak: Seq[String]): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol) +: tiebreak.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.select(Seq(col(groupCol), col(valueCol),
        col(weightCol).cast("long").as("_w")) ++ tiebreak.map(col): _*)
      .withColumn("_cw", sum(col("_w")).over(wOrd))
      .withColumn("_tot", sum(col("_w")).over(wAll))
      .filter(col("_cw") * 2 >= col("_tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("wmedian"), max(col("_tot")).as("total_w"))
  }

  // Poisson(1) inverse-CDF ladder (cumulative P(X<=k), k = 0..7),
  // fixed DECIMAL literals so both engines compare the same doubles
  private val PoissonCdf = Seq(
    0.367879441171, 0.735758882343, 0.919698602929, 0.981011843124,
    0.996340153173, 0.999405815182, 0.999916758851, 0.999989750803)

  /** Poisson bootstrap confidence interval for the per-group mean —
    * THE distributed bootstrap (Chamandy et al., public): instead of
    * resampling n rows with replacement (which needs n and a global
    * shuffle per replicate), every row draws an independent
    * Poisson(1) weight per replicate, which converges to multinomial
    * resampling at corpus n. Here the Poisson draw is an md5-uniform
    * pushed through a fixed inverse-CDF ladder, so every replicate —
    * and therefore the whole CI — replays bit-identically on any
    * engine and any partitioning.
    *
    * Output per group: the full-sample mean estimate and the
    * [2nd, (b−1)th] order statistics of the b replicate means (a
    * ~94% interval at b = 32) — rank-selected, never interpolated,
    * so the cut is engine-exact. Values quantize to cents so every
    * replicate sum is an exact int64.
    *
    * Scale shape: the b-way explode happens map-side and feeds ONE
    * map-side-combinable (group, replicate) aggregation — the
    * shuffle carries groups×b partial rows, not data×b. The order
    * statistics ride a groups×b-sized window. */
  def bootstrapCI(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, b: Int = 32): DataFrame = {
    require(b >= 8)
    import graft.functions.HashFunctions.md5Long
    import org.apache.spark.sql.expressions.Window
    val vq = floor(col(valueCol).cast("double") * 100 + lit(0.5)).cast("long")
    val u = md5Long(concat(lit("boot:"), col("_id").cast("string"),
      lit(":"), col("_rep").cast("string"))).cast("double") /
      lit((1L << 60).toDouble)
    val w = PoissonCdf.zipWithIndex.foldRight(lit(PoissonCdf.size.toLong)) {
      case ((p, k), rest) => when(u < p, lit(k.toLong)).otherwise(rest)
    }
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(idCol).as("_id"), vq.as("_vq"))
    val reps = base
      .withColumn("_rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("_w", w)
      .groupBy("g", "_rep")
      .agg(sum(col("_w") * col("_vq")).as("_ws"), sum("_w").as("_wn"))
      .withColumn("_mean",
        round(col("_ws").cast("double") / col("_wn") / 100.0, 6))
    val wRank = Window.partitionBy("g").orderBy(col("_mean"), col("_rep"))
    val ci = reps
      .withColumn("_rnk", row_number().over(wRank))
      .groupBy("g")
      .agg(min(when(col("_rnk") === 2, col("_mean"))).as("ci_lo"),
        min(when(col("_rnk") === b - 1, col("_mean"))).as("ci_hi"))
    val est = base.groupBy("g")
      .agg(round(sum("_vq").cast("double") / count(lit(1)) / 100.0, 6)
        .as("est_mean"))
    est.join(ci, Seq("g"))
      .select(col("g").as(groupCol), col("est_mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Kruskal–Wallis H: does an INTEGER-quantized score (pass cents)
    * have the same distribution across the k groups? The rank-based
    * one-way ANOVA — the segment-comparison test to reach for when
    * the metric is skewed/heavy-tailed and a mean-based F-test
    * ([[anovaF]]) would be driven by outliers. One row: k, n, the H
    * statistic and its tie-corrected variant (null when every score
    * is identical — zero rank variance, H undefined).
    *
    * Exactness: average ranks are half-integers, carried doubled
    * (2·avgrank = 2·|{<s}| + |{=s}| + 1, an int64), so every rank
    * sum R_j accumulates exactly and order-free; Σ(t³−t) for the tie
    * correction is an exact int64 too. Each group's R_j²/n_j is a
    * couple of correctly-rounded double ops on identical operands;
    * the k-term final sum is absorbed by round-6.
    *
    * Scale shape: one map-side-combined count per distinct score (the
    * quantized score domain is BOUNDED — cents of a capped metric),
    * one ordered window over that bounded relation for the global
    * ranks, one broadcast join back onto the (group, score) counts,
    * then a k-row reduction. The raw data is never globally sorted. */
  def kruskalWallis(df: DataFrame, groupCol: String,
                    scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && scoreCol.isNotNull)
      .select(col(groupCol).as("_g"), scoreCol.cast("long").as("_s"))
    val sc = base.groupBy("_s").agg(count(lit(1)).as("_t"))
    val prev = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = sc
      .withColumn("_r2",
        lit(2L) * coalesce(sum("_t").over(prev), lit(0L)) + col("_t") + 1L)
    val perG = base.groupBy("_g", "_s").agg(count(lit(1)).as("_c"))
      .join(broadcast(ranked.select("_s", "_r2")), Seq("_s"))
      .groupBy("_g")
      .agg(sum("_c").as("_nj"), sum(col("_c") * col("_r2")).as("_r2j"))
    val ties = sc.agg(sum("_t").as("_n"),
      sum(col("_t") * col("_t") * col("_t") - col("_t")).as("_tie"))
    val agg = perG.crossJoin(broadcast(ties))
      .agg(count(lit(1)).as("k"), max("_n").as("n"),
        sum(pow(col("_r2j").cast("double"), 2) / col("_nj") / lit(4.0))
          .as("_sr"),
        max("_tie").as("_tieT"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + 1)) * col("_sr") - lit(3.0) * (nD + 1)
    val corr = lit(1.0) - col("_tieT").cast("double") / (nD * nD * nD - nD)
    agg.select(col("k"), col("n"), round(h, 6).as("h"),
      round(when(corr > 0, h / corr), 6).as("h_tie"))
  }

  /** Mann–Whitney U: the two-sample special case of
    * [[kruskalWallis]], but with the DIRECTIONAL readout the omnibus
    * H can't give — U_A says how often an A draw beats a B draw
    * (U_A/(n_A·n_B) is the common-language effect size), and the
    * tie-corrected z gives the test. The A/B test to reach for on a
    * skewed metric where the t-test's mean is the wrong summary.
    *
    * Exactness: the same doubled-rank machinery as [[kruskalWallis]]
    * (2·avgrank = 2·|{<s}| + |{=s}| + 1, int64), so 2·R_A and
    * 2·U_A = 2·R_A − n_A(n_A+1) are exact int64; U halves exactly in
    * FP. μ and the tie-corrected σ² are closed forms on exact int64
    * operands in a fixed order. z (no continuity correction —
    * documented contract, mirrored by the oracle) is null when σ = 0
    * (every score identical) or either group is empty.
    *
    * Scale shape: identical to [[kruskalWallis]] — distinct-score
    * counts (bounded domain), one window over that bounded relation,
    * broadcast join back, two-row reduction. Raw data never sorts. */
  def mannWhitneyU(df: DataFrame, isSliceA: Column,
                   scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(isSliceA.isNotNull && scoreCol.isNotNull)
      .select(isSliceA.as("_a"), scoreCol.cast("long").as("_s"))
    val sc = base.groupBy("_s").agg(count(lit(1)).as("_t"))
    val prev = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = sc.withColumn("_r2",
      lit(2L) * coalesce(sum("_t").over(prev), lit(0L)) + col("_t") + 1L)
    val perA = base.groupBy("_a", "_s").agg(count(lit(1)).as("_c"))
      .join(broadcast(ranked.select("_s", "_r2")), Seq("_s"))
      .groupBy("_a")
      .agg(sum("_c").as("_nj"), sum(col("_c") * col("_r2")).as("_r2j"))
    val ties = sc.agg(sum(col("_t") * col("_t") * col("_t") - col("_t"))
      .as("_tie"))
    val agg = perA.crossJoin(broadcast(ties))
      .agg(max(when(col("_a"), col("_nj"))).as("n_a"),
        max(when(!col("_a"), col("_nj"))).as("n_b"),
        max(when(col("_a"), col("_r2j"))).as("_r2a"),
        max("_tie").as("_tieT"))
      .filter(col("n_a").isNotNull && col("n_b").isNotNull)
    // 2·U_A = 2·R_A − n_A(n_A+1), exact int64
    val u2a = col("_r2a") - col("n_a") * (col("n_a") + 1L)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nD = naD + nbD
    val mu = naD * nbD / 2.0
    val sig2 = naD * nbD / 12.0 *
      ((nD + 1) - col("_tieT").cast("double") / (nD * (nD - 1)))
    agg.select(col("n_a"), col("n_b"),
      (u2a.cast("double") / 2.0).as("u_a"),
      (naD * nbD - u2a.cast("double") / 2.0).as("u_b"),
      round(when(sig2 > 0, (u2a.cast("double") / 2.0 - mu) / sqrt(sig2)), 6)
        .as("z"))
  }

  /** Cliff's delta ordinal effect size: δ = P(x>y) − P(x<y) =
    * 2U_A/(n_A·n_B) − 1 — HOW BIG the two-sample rank difference is
    * (q391's z says only whether it exists; at corpus scale
    * everything is "significant"). Rides [[mannWhitneyU]]'s doubled-
    * rank machinery: U_A is already exact in halves, so δ is one
    * fixed division, and the common-language effect size
    * CLES = U_A/(n_A·n_B) comes free. The magnitude label uses the
    * standard Romano et al. cuts (|δ| < 0.147 negligible, < 0.33
    * small, < 0.474 medium, else large).
    *
    * Returns one row (n_a, n_b, cliffs_delta, cles, magnitude).
    *
    * Scale shape: exactly [[mannWhitneyU]]'s — one reduced (score)
    * shuffle, doubled ranks over the distinct-score window, one
    * pivoted row. */
  def cliffsDelta(df: DataFrame, isSliceA: Column,
                  scoreCol: Column): DataFrame = {
    val mw = mannWhitneyU(df, isSliceA, scoreCol)
    val prod = col("n_a").cast("double") * col("n_b").cast("double")
    val delta = lit(2.0) * col("u_a") / when(prod > 0, prod) - 1
    val mag = when(abs(delta) < 0.147, "negligible")
      .when(abs(delta) < 0.33, "small")
      .when(abs(delta) < 0.474, "medium")
      .otherwise("large")
    mw.select(col("n_a"), col("n_b"),
      round(delta, 6).as("cliffs_delta"),
      round(col("u_a") / when(prod > 0, prod), 6).as("cles"),
      when(prod > 0, mag).as("magnitude"))
  }

  /** Mood's median test across k groups: classify every value
    * against the POOLED median, then χ² on the k×2 above/at-or-below
    * table — the coarse-but-assumption-free location test (only
    * counts cross the median, so one wild tail can't move it; the
    * trade is power vs [[kruskalWallis]]). Expected counts from the
    * margins; χ² = Σ(O−E)²/E over the 2k cells, df = k−1.
    *
    * Exactness: the pooled median is the exact interpolated
    * percentile; above/at-or-below counts are exact int64; each
    * cell's rational term is ×10⁹-quantized and summed as
    * decimal(38,0); one division back. NULL when any margin is 0.
    *
    * Returns one row (k, n, n_above, chi2, df).
    *
    * Scale shape: one exact-percentile agg broadcast back, one
    * reduced (group) count shuffle, a k-row quantized reduction. */
  def moodsMedianTest(df: DataFrame, groupCol: String,
                      valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_v"))
    val med = broadcast(base.agg(
      expr("percentile(_v, 0.5)").as("_med")))
    val cells = base.crossJoin(med)
      .groupBy(col("_g"))
      .agg(sum(when(col("_v").cast("double") > col("_med"), 1L)
        .otherwise(0L)).as("_ab"),
        sum(when(col("_v").cast("double") > col("_med"), 0L)
          .otherwise(1L)).as("_be"))
    val tot = broadcast(cells.agg(sum("_ab").as("_ta"),
      sum("_be").as("_tb"), count(lit(1)).as("_k")))
    val withT = cells.crossJoin(tot)
    val n = (col("_ta") + col("_tb")).cast("double")
    val ni = (col("_ab") + col("_be")).cast("double")
    val ea = ni * col("_ta").cast("double") / n
    val eb = ni * col("_tb").cast("double") / n
    val term =
      (col("_ab").cast("double") - ea) * (col("_ab").cast("double") - ea) /
        when(ea > 0, ea) +
      (col("_be").cast("double") - eb) * (col("_be").cast("double") - eb) /
        when(eb > 0, eb)
    val agg = withT
      .select(floor(term * 1e9 + lit(0.5)).cast("long").cast(dec)
        .as("_tq"), col("_ta"), col("_tb"), col("_k"))
      .groupBy(col("_ta"), col("_tb"), col("_k"))
      .agg(sum("_tq").as("_s"))
    val ok = col("_ta") > 0 && col("_tb") > 0 && col("_k") >= 2
    agg.select(col("_k").as("k"), (col("_ta") + col("_tb")).as("n"),
      col("_ta").as("n_above"),
      round(when(ok, col("_s").cast("double") / 1e9), 6).as("chi2"),
      (col("_k") - 1).as("df"))
  }

  /** Wilcoxon signed-rank: the PAIRED companion to [[mannWhitneyU]]
    * — each unit carries its own before/after (or A/B) difference,
    * so between-unit variance cancels instead of inflating σ. Zero
    * differences are dropped (the standard Wilcoxon reduction; n is
    * the non-zero count), |d| is ranked with average ranks, and
    * W⁺ = Σ ranks of positive d. Tie-corrected normal z.
    *
    * Exactness: doubled ranks over the distinct-|d| counts are
    * int64, so 2·W⁺ is an exact int64 and W⁺ halves exactly in FP;
    * μ = n(n+1)/4 and σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48 are closed
    * forms on exact operands. σ² > 0 whenever n ≥ 1 (the tie term
    * subtracts at most half the variance), so the σ = 0 guard only
    * fires on the empty relation → z null there.
    *
    * Scale shape: distinct-|d| counts (bounded cent domain), one
    * window over that bounded relation, broadcast join back, one-row
    * reduction — [[kruskalWallis]]'s cost class. */
  def wilcoxonSignedRank(df: DataFrame, diffCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(diffCol.isNotNull)
      .select(diffCol.cast("long").as("_d"))
      .filter(col("_d") =!= 0L)
      .select(abs(col("_d")).as("_s"), (col("_d") > 0L).as("_pos"))
    val sc = base.groupBy("_s").agg(count(lit(1)).as("_t"))
    val prev = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = sc.withColumn("_r2",
      lit(2L) * coalesce(sum("_t").over(prev), lit(0L)) + col("_t") + 1L)
    val perSign = base.groupBy("_pos", "_s").agg(count(lit(1)).as("_c"))
      .join(broadcast(ranked.select("_s", "_r2")), Seq("_s"))
      .groupBy("_pos")
      .agg(sum("_c").as("_nj"), sum(col("_c") * col("_r2")).as("_r2j"))
    val ties = sc.agg(sum(col("_t") * col("_t") * col("_t") - col("_t"))
      .as("_tie"))
    val agg = perSign.crossJoin(broadcast(ties))
      .agg(coalesce(max(when(col("_pos"), col("_nj"))), lit(0L)).as("n_pos"),
        coalesce(max(when(!col("_pos"), col("_nj"))), lit(0L)).as("n_neg"),
        coalesce(max(when(col("_pos"), col("_r2j"))), lit(0L)).as("_w2p"),
        max("_tie").as("_tieT"))
    val nL = col("n_pos") + col("n_neg")
    val nD = nL.cast("double")
    val mu = nD * (nD + 1) / 4.0
    val sig2 = nD * (nD + 1) * (nD * 2 + 1) / 24.0 -
      col("_tieT").cast("double") / 48.0
    agg.select(col("n_pos"), col("n_neg"), nL.as("n"),
      (col("_w2p").cast("double") / 2.0).as("w_plus"),
      round(when(sig2 > 0, (col("_w2p").cast("double") / 2.0 - mu) /
        sqrt(sig2)), 6).as("z"))
  }

  /** Spearman rank correlation per group: Pearson on the average
    * ranks of x and y within each group — the monotonic-association
    * readout that is invariant to any monotone transform of either
    * variable (is value drifting with time AT ALL, linear or not).
    *
    * Exactness: doubled average ranks (2·rank_min + ties − 1) are
    * int64; every Σ, Σ², Σxy accumulates in decimal(38,0) — exact and
    * order-free far past int64 (ranks reach 2n, products 4n², sums
    * 4n³ ≈ 10²² for n=10⁷ — decimal holds to 10³⁸). Numerator and
    * the two variance terms are exact integers cast once to double;
    * ρ is then three correctly-rounded ops on identical operands.
    * Groups with zero variance in either variable return null.
    *
    * Scale shape: two rank windows per group (one sort each, both
    * partitioned by the group key — nothing global) plus per-(g,
    * value) tie counts windows over the same partitioning, then one
    * map-side-combinable group agg. */
  def spearmanByGroup(df: DataFrame, groupCol: String,
                      xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(groupCol).isNotNull && xCol.isNotNull && yCol.isNotNull)
      .select(col(groupCol).as("_g"), xCol.as("_x"), yCol.as("_y"))
    val rx = lit(2L) * rank().over(Window.partitionBy("_g").orderBy("_x")) +
      count(lit(1)).over(Window.partitionBy("_g", "_x")) - 1L
    val ry = lit(2L) * rank().over(Window.partitionBy("_g").orderBy("_y")) +
      count(lit(1)).over(Window.partitionBy("_g", "_y")) - 1L
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val sums = base.withColumn("_rx", rx).withColumn("_ry", ry)
      .groupBy("_g")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("_rx")) * col("_ry")).as("_sxy"),
        sum(dec(col("_rx")) * col("_rx")).as("_sxx"),
        sum(dec(col("_ry")) * col("_ry")).as("_syy"),
        sum(dec(col("_rx"))).as("_sx"), sum(dec(col("_ry"))).as("_sy"))
    val nDec = dec(col("n"))
    val num = (nDec * col("_sxy") - col("_sx") * col("_sy")).cast("double")
    val vx = (nDec * col("_sxx") - col("_sx") * col("_sx")).cast("double")
    val vy = (nDec * col("_syy") - col("_sy") * col("_sy")).cast("double")
    sums.select(col("_g").as(groupCol), col("n"),
      round(when(vx > 0 && vy > 0, num / sqrt(vx * vy)), 6).as("rho"))
  }

  /** Attribution model comparison: first-touch, last-touch and
    * linear credits per channel, side by side from ONE pass — the
    * "does our channel ranking depend on the attribution model"
    * read, instead of three separate reports nobody reconciles.
    * For each conversion, the touches in the lookback window before
    * it credit their channel: wholly to the earliest (first), wholly
    * to the latest (last), and 1/n each (linear).
    *
    * Determinism: first/last ride min/max over (ts, id, channel)
    * structs — total order, no FP; linear credits are the integer
    * quanta 10⁶ div n summed exactly (a conversion's credits may
    * undershoot 10⁶ by < n µunits — documented, engine-identical).
    * Same-instant touches are excluded by the frame's −1 bound, like
    * [[funnel]]'s strictly-before contract.
    *
    * Scale shape: ONE user-keyed window sort (the sessionizer
    * shuffle) carrying three frame aggregates; the only fan-out is
    * exploding per-conversion CHANNEL lists (lookback-bounded, the
    * q128 state class); credit tables are channels-sized and
    * full-join at the end. */
  def attributionCompare(events: DataFrame, userCol: Column,
                         tsCol: Column, idCol: Column, typeCol: Column,
                         convType: String, lookbackNs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lookbackNs > 0)
    val base = events
      .filter(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull)
      .select(userCol.as("_u"), tsCol.cast("long").as("_t"),
        idCol.cast("long").as("_id"), typeCol.as("_ty"))
    val fr = Window.partitionBy("_u").orderBy("_t")
      .rangeBetween(-lookbackNs, -1)
    val isTouch = col("_ty") =!= convType
    val withFrames = base
      .withColumn("_fl", collect_list(when(isTouch, col("_ty"))).over(fr))
      .withColumn("_first", min(when(isTouch,
        struct(col("_t"), col("_id"), col("_ty")))).over(fr))
      .withColumn("_last", max(when(isTouch,
        struct(col("_t"), col("_id"), col("_ty")))).over(fr))
    val convs = withFrames
      .filter(col("_ty") === convType && size(col("_fl")) > 0)
      .select(col("_fl"), size(col("_fl")).cast("long").as("_n"),
        col("_first").getField("_ty").as("_fty"),
        col("_last").getField("_ty").as("_lty"))
    val firsts = convs.groupBy(col("_fty").as("channel"))
      .agg(count(lit(1)).as("first_credits"))
    val lasts = convs.groupBy(col("_lty").as("channel"))
      .agg(count(lit(1)).as("last_credits"))
    val linear = convs
      .select(explode(col("_fl")).as("channel"),
        expr("1000000L div _n").as("_q"))
      .groupBy("channel").agg(sum("_q").as("_lq"))
    firsts.join(lasts, Seq("channel"), "full_outer")
      .join(linear, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_credits"), lit(0L)).as("first_credits"),
        coalesce(col("last_credits"), lit(0L)).as("last_credits"),
        round(coalesce(col("_lq"), lit(0L)).cast("double") / 1e6, 6)
          .as("linear_credits"))
  }

  /** Leaderboard churn between two periods: rank the keys by a
    * metric in period A and period B, keep each period's top-N, and
    * report per key its ranks, status (stayed / entered / exited)
    * and rank shift — the "what moved on the leaderboard" read
    * behind every top-sellers/top-queries review, as a diff rather
    * than two lists a human eyeballs.
    *
    * Determinism: pass an integer-quantized metric; per-period sums
    * are exact int64, ranks order (sum desc, key) — total order, no
    * FP boundary. Keys with zero metric in a period rank by the
    * tiebreak like any other but a top-N cut on real data never
    * reaches them.
    *
    * Scale shape: one keyed agg over the fact scan, then two global
    * windows over the KEYS relation (dimension-sized — the RFM/ntile
    * cost class; swap to TakeOrderedAndProject per period if the key
    * dimension itself outgrows a sort). Output ≤ 2N rows. */
  def leaderboardChurn(df: DataFrame, keyCol: String, inA: Column,
                       metricCol: Column, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 1)
    val perKey = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("_k"))
      .agg(sum(when(inA, metricCol.cast("long")).otherwise(0L)).as("_ma"),
        sum(when(inA, 0L).otherwise(metricCol.cast("long"))).as("_mb"))
    val ranked = perKey
      .withColumn("_ra", row_number().over(
        Window.orderBy(col("_ma").desc, col("_k"))))
      .withColumn("_rb", row_number().over(
        Window.orderBy(col("_mb").desc, col("_k"))))
    ranked.filter(col("_ra") <= topN || col("_rb") <= topN)
      .select(col("_k").as(keyCol),
        when(col("_ra") <= topN, col("_ra")).cast("long").as("rank_a"),
        when(col("_rb") <= topN, col("_rb")).cast("long").as("rank_b"),
        when(col("_ra") <= topN && col("_rb") <= topN, "stayed")
          .when(col("_rb") <= topN, "entered")
          .otherwise("exited").as("status"),
        when(col("_ra") <= topN && col("_rb") <= topN,
          col("_ra") - col("_rb")).cast("long").as("rank_shift"))
  }

  /** Kendall tau-b rank correlation between two metrics, per group —
    * the tie-correct companion to Spearman ([[spearmanByGroup]]'s
    * sibling read): tau counts CONCORDANT vs DISCORDANT pairs, so it
    * is interpretable as a probability and robust where Spearman's
    * rank-square arithmetic over-weights mid-rank swaps. tau-b's
    * denominator corrects for ties on either side.
    *
    * FULLY integer-exact: C, D and the tie counts are int64 pair
    * counts; the denominator multiplies (n₀−n₁)(n₀−n₂) as
    * decimal(38,0) and the one sqrt+division per group runs on
    * identical operands. NULL when either factor is 0 (a constant
    * side has no ranking).
    *
    * Scale shape: the [[TimeSeries.mannKendall]] bounded-input
    * contract — run on PRE-AGGREGATED series (daily rollups), never
    * raw events: the within-group pair join is quadratic per group
    * BY DESIGN (q189's documented class). One group-keyed shuffle,
    * pair expansion bounded by series length². */
  def kendallTauB(df: DataFrame, groupCol: String, tCol: Column,
                  xCol: Column, yCol: Column): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull &&
        tCol.isNotNull && xCol.isNotNull && yCol.isNotNull)
      .select(col(groupCol).as("_g"), tCol.as("_t"),
        xCol.cast("long").as("_x"), yCol.cast("long").as("_y"))
    val a = base.select(col("_g"), col("_t").as("_ta"),
      col("_x").as("_xa"), col("_y").as("_ya"))
    val b = base.select(col("_g"), col("_t").as("_tb"),
      col("_x").as("_xb"), col("_y").as("_yb"))
    val pairs = a.join(b, Seq("_g")).filter(col("_ta") < col("_tb"))
    val agg = pairs.groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("_n0"),
        sum(when((col("_xa") < col("_xb") && col("_ya") < col("_yb")) ||
          (col("_xa") > col("_xb") && col("_ya") > col("_yb")), 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("_xa") < col("_xb") && col("_ya") > col("_yb")) ||
          (col("_xa") > col("_xb") && col("_ya") < col("_yb")), 1L)
          .otherwise(0L)).as("discordant"),
        sum(when(col("_xa") === col("_xb"), 1L).otherwise(0L)).as("ties_x"),
        sum(when(col("_ya") === col("_yb"), 1L).otherwise(0L)).as("ties_y"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val den = d(col("_n0") - col("ties_x")) * d(col("_n0") - col("ties_y"))
    agg.select(col(groupCol), col("_n0").as("n_pairs"),
      col("concordant"), col("discordant"), col("ties_x"), col("ties_y"),
      round(when(den > 0,
        (col("concordant") - col("discordant")).cast("double") /
          sqrt(den.cast("double"))), 6).as("tau_b"))
  }

  /** One-way ANOVA F: does the metric's MEAN differ across the k
    * groups? Decomposes total variance into between-group and
    * within-group sums of squares over a `scale`-quantized metric
    * (default cents) and reports F = (SSB/(k−1)) / (SSW/(n−k)) with
    * η² = SSB/SST — the effect-size companion the bare F hides.
    * Complements [[kruskalWallis]] (means vs distributions).
    *
    * Exactness: per group only n_j, Σq, Σq² are aggregated — the
    * first two int64, Σq² in decimal(38,0) (q ≈ 10⁷ cents ⇒ q² ≈
    * 10¹⁴, times 10¹⁰ rows ≈ 10²⁴ — decimal territory, exact and
    * order-free). SSW/SSB terms are per-group double expressions on
    * identical operands; the k-term sums are absorbed by round-6.
    * Reported SS are de-scaled back to metric² units.
    *
    * Scale shape: ONE map-side-combined group agg over the scan,
    * then a k-row reduction — the cheapest possible shape; no sort,
    * no window, no join. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: Column,
             scale: Long = 100L): DataFrame = {
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val perG = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), q.as("_q"))
      .groupBy("_g")
      .agg(count(lit(1)).as("_nj"), sum("_q").as("_sj"),
        sum(col("_q").cast("decimal(38,0)") * col("_q")).as("_qj"))
    val nj = col("_nj").cast("double")
    val sj = col("_sj").cast("double")
    val agg = perG
      .agg(count(lit(1)).as("k"), sum("_nj").as("n"),
        sum("_sj").as("_s"),
        sum(col("_qj").cast("double") - sj * sj / nj).as("_ssw"),
        sum(sj * sj / nj).as("_sb"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("_sb") - col("_s").cast("double") * col("_s") / nD
    val den = lit(scale.toDouble * scale)
    val f = (ssb / (kD - 1)) / (col("_ssw") / (nD - kD))
    agg.select(col("k"), col("n"),
      round(ssb / den, 6).as("ss_between"),
      round(col("_ssw") / den, 6).as("ss_within"),
      round(when(col("_ssw") > 0 && col("n") > col("k"), f), 6).as("f"),
      round(when(ssb + col("_ssw") > 0, ssb / (ssb + col("_ssw"))), 6)
        .as("eta_sq"))
  }

  /** Exact-permutation test for the difference in group means —
    * the assumption-free significance answer when normal-theory
    * tests ([[abTest]]'s z, [[anovaF]]) can't be trusted (tiny n,
    * weird distributions): relabel the observations `reps` times,
    * each relabeling an EXACT permutation preserving the group
    * sizes (md5-ranked order, first n_A rows become group A), and
    * report p = (1 + #{|T_perm| ≥ |T_obs|}) / (reps + 1) with the
    * standard add-one correction. md5-seeded ⇒ the p-value is a pure
    * function of the data — reproducible across engines, reruns and
    * partitionings, which a `rand()`-based resampler can never be.
    *
    * Exactness: values are integer-quantized by the caller, so all
    * permutation sums are exact int64; each T is two divisions on
    * identical operands, and the ≥ comparisons see identical doubles
    * in both engines.
    *
    * Scale shape: same bounded-input contract as [[TimeSeries.mannKendall]]
    * — run it on PRE-AGGREGATED observations (daily rollups: 60 obs ×
    * 200 reps = 12k rows), never raw events. The per-rep rank is a
    * window partitioned by replicate over those bounded rows; totals
    * are 1-row broadcasts. For row-level testing at scale use
    * [[bootstrapCI]] (per-row Poisson weights, no permutation). */
  def permutationTest(obs: DataFrame, inA: Column, valueCol: Column,
                      idCol: Column, reps: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.HashFunctions.md5Long
    require(reps >= 1)
    val base = obs.select(inA.as("_a"), valueCol.cast("long").as("_v"),
      idCol.cast("string").as("_id"))
    val tot = broadcast(base.agg(
      sum(when(col("_a"), col("_v"))).as("_sa"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("_na"),
      sum(col("_v")).as("_s"), count(lit(1)).as("_n")))
    val w = Window.partitionBy("_rep").orderBy(
      md5Long(concat(lit("perm:"), col("_rep").cast("string"), lit(":"),
        col("_id"))), col("_id"))
    val perm = base.crossJoin(tot)
      .select(col("_v"), col("_id"), col("_na"), col("_s"), col("_n"),
        explode(sequence(lit(1), lit(reps))).as("_rep"))
      .withColumn("_rn", row_number().over(w))
      .groupBy("_rep")
      .agg(sum(when(col("_rn") <= col("_na"), col("_v"))).as("_psa"),
        max("_na").as("_pna"), max("_s").as("_ps"), max("_n").as("_pn"))
      .select((col("_psa").cast("double") / col("_pna") -
        (col("_ps") - col("_psa")).cast("double") /
          (col("_pn") - col("_pna"))).as("_t"))
    val obsStat = broadcast(tot.select(
      (col("_sa").cast("double") / col("_na") -
        (col("_s") - col("_sa")).cast("double") /
          (col("_n") - col("_na"))).as("_t0"),
      col("_na").as("_ona"), col("_n").as("_on")))
    perm.crossJoin(obsStat)
      .agg(sum(when(abs(col("_t")) >= abs(col("_t0")), 1L).otherwise(0L))
          .as("_ge"),
        max("_t0").as("_t0"), max("_ona").as("_na"), max("_on").as("_n"))
      .select(col("_na").as("n_a"), (col("_n") - col("_na")).as("n_b"),
        round(col("_t0"), 6).as("t_obs"),
        round((col("_ge") + 1).cast("double") / lit((reps + 1).toDouble), 6)
          .as("p_value"))
  }

  /** Activity streaks per key (gaps-and-islands): collapse to
    * distinct (key, day), then `day − row_number()` is constant
    * exactly within a run of consecutive days — the island key that
    * turns "longest/current streak" into two plain aggregations. One
    * row per key: n_active_days, n_streaks, longest_streak, and
    * last_streak (the streak touching the key's final active day —
    * "current" as of the data's horizon). All exact integers.
    *
    * Scale shape: one distinct-collapse (map-side combined), one
    * key-partitioned window (row_number rides the same shuffle), two
    * map-side-combinable aggs on the SAME key partitioning — AQE
    * reuses the exchange end-to-end. Nothing global. */
  def activityStreaks(df: DataFrame, keyCol: String,
                      dayCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.filter(col(keyCol).isNotNull && dayCol.isNotNull)
      .select(col(keyCol).as("_k"), dayCol.cast("long").as("_d"))
      .distinct()
    val w = Window.partitionBy("_k").orderBy("_d")
    val islands = days
      .withColumn("_island", col("_d") - row_number().over(w))
      .groupBy("_k", "_island")
      .agg(count(lit(1)).as("_len"), max("_d").as("_last"))
    islands
      .groupBy(col("_k"))
      .agg(sum("_len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("_len").as("longest_streak"),
        max(struct(col("_last"), col("_len"))).as("_top"))
      .select(col("_k").as(keyCol), col("n_active_days"),
        col("n_streaks"), col("longest_streak"),
        col("_top._len").as("last_streak"))
  }

  /** Trimmed mean per group: drop the lowest and highest
    * ⌊n·trimPercent/100⌋ values (INTEGER arithmetic on the exact
    * count — an FP `n·0.1` cut rounds differently across engines at
    * exact multiples of ten) and average the rest of the
    * `scale`-quantized metric — outlier-robust central tendency
    * that, unlike [[weightedMedian]], still uses the bulk of the
    * data's magnitude. One row per group: n, n_used, trimmed_mean.
    *
    * Scale shape: one group-partitioned rank window (sort within
    * group only) + one map-side-combinable agg on the same key
    * partitioning. Exact int64 cent sums. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: Column,
                  tiebreak: Seq[Column], trimPercent: Int = 10,
                  scale: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trimPercent >= 0 && trimPercent < 50)
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val tbCols = tiebreak.zipWithIndex.map { case (c, i) => c.as(s"_tb$i") }
    val w = Window.partitionBy("_g").orderBy(
      col("_q") +: tiebreak.indices.map(i => col(s"_tb$i")): _*)
    val wAll = Window.partitionBy("_g")
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(Seq(col(groupCol).as("_g"), q.as("_q")) ++ tbCols: _*)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_t", expr(s"_n * $trimPercent div 100"))
    base.filter(col("_rn") > col("_t") && col("_rn") <= col("_n") - col("_t"))
      .groupBy(col("_g").as(groupCol))
      .agg(max("_n").as("n"), count(lit(1)).as("n_used"),
        round(sum("_q").cast("double") / count(lit(1)) / scale, 6)
          .as("trimmed_mean"))
  }

  /** Two-level hierarchical shares: every (parent, child) cell with
    * its value, its share OF ITS PARENT, and the parent's share of
    * the total — the drill-down table a flat ratio-to-report
    * ([[q155]]-style single-level shares) can't give in one pass.
    * Pass an integer-quantized value expression.
    *
    * Exactness: exact int64 cell sums; the two share divisions see
    * identical operands on any engine.
    *
    * Scale shape: one (parent, child) agg with map-side combine,
    * then two windows over the BOUNDED hierarchy relation (the
    * documented bounded-relation global-window pattern — a hierarchy
    * that doesn't fit a window isn't one a human drills into). */
  def hierarchicalShares(df: DataFrame, parentCol: String,
                         childCol: String, valueQ: Column,
                         scale: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = df.filter(col(parentCol).isNotNull && col(childCol).isNotNull)
      .groupBy(col(parentCol), col(childCol))
      .agg(sum(valueQ.cast("long")).as("_v"))
    agg
      .withColumn("_t1", sum("_v").over(Window.partitionBy(parentCol)))
      .withColumn("_tt", sum("_v").over(Window.partitionBy()))
      .select(col(parentCol), col(childCol),
        round(col("_v").cast("double") / scale, 6).as("value"),
        round(col("_v").cast("double") / col("_t1"), 6)
          .as("share_of_parent"),
        round(col("_t1").cast("double") / col("_tt"), 6)
          .as("parent_share_of_total"))
  }

  /** Knee/elbow detection on a bounded curve (Kneedle-lite, public):
    * min-max normalize both axes, then the knee is the point with
    * the maximum |vertical distance| to the (0,0)→(1,1) chord — the
    * "diminishing returns start HERE" read used to choose k for
    * IVF/k-means, truncation ranks, cache sizes. Ties break on x.
    * One row: (knee_x, knee_y, dist).
    *
    * Exactness: extremes are exact aggregates (1-row broadcast);
    * each point's normalized distance is a handful of correctly-
    * rounded double ops on identical operands; the argmax orders on
    * those identical doubles with the x tiebreak.
    *
    * Scale shape: meant for BOUNDED curves (per-day cumulative
    * counts, rank-truncated Lorenz points) — one broadcast of the
    * extremes and one TakeOrdered(1). A curve that doesn't fit this
    * contract isn't a curve a human reads a knee off. */
  def kneeDetection(curve: DataFrame, xCol: Column,
                    yCol: Column): DataFrame = {
    val base = curve.filter(xCol.isNotNull && yCol.isNotNull)
      .select(xCol.cast("double").as("_x"), yCol.cast("double").as("_y"))
    val ext = broadcast(base.agg(min("_x").as("_x0"), max("_x").as("_x1"),
      min("_y").as("_y0"), max("_y").as("_y1")))
    val xn = (col("_x") - col("_x0")) / (col("_x1") - col("_x0"))
    val yn = (col("_y") - col("_y0")) / (col("_y1") - col("_y0"))
    base.crossJoin(ext)
      .filter(col("_x1") > col("_x0") && col("_y1") > col("_y0"))
      .withColumn("_d", yn - xn)
      .orderBy(abs(col("_d")).desc, col("_x"))
      .limit(1)
      .select(col("_x").as("knee_x"), col("_y").as("knee_y"),
        round(col("_d"), 6).as("dist"))
  }

  /** Difference-in-differences: the 2×2 (treated × post) cell means
    * of a `scale`-quantized metric and the DiD estimate
    * (T_post − T_pre) − (C_post − C_pre) — the first-order causal
    * read when treatment wasn't randomized but both groups share a
    * pre-trend. One row; null DiD when any cell is empty (a missing
    * cell means the design, not the math, failed).
    *
    * Exactness: ONE conditional-sum agg — four exact int64 counts +
    * four exact int64 sums; the four means and three subtractions
    * are correctly-rounded doubles on identical operands.
    *
    * Scale shape: single map-side-combined aggregation; nothing
    * else. */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
                 valueCol: Column, scale: Long = 100L): DataFrame = {
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    def cell(t: Boolean, p: Boolean) = {
      val m = (if (t) col("_t") else !col("_t")) &&
        (if (p) col("_p") else !col("_p"))
      (sum(when(m, 1L).otherwise(0L)), sum(when(m, col("_q"))))
    }
    val ((ntpre, stpre), (ntpost, stpost)) = (cell(t = true, p = false),
      cell(t = true, p = true))
    val ((ncpre, scpre), (ncpost, scpost)) = (cell(t = false, p = false),
      cell(t = false, p = true))
    val agg = df.filter(valueCol.isNotNull)
      .select(treated.as("_t"), post.as("_p"), q.as("_q"))
      .agg(ntpre.as("_ntpre"), stpre.as("_stpre"),
        ntpost.as("_ntpost"), stpost.as("_stpost"),
        ncpre.as("_ncpre"), scpre.as("_scpre"),
        ncpost.as("_ncpost"), scpost.as("_scpost"))
    def mean(s: String, n: String) =
      col(s).cast("double") / col(n) / scale
    val did = (mean("_stpost", "_ntpost") - mean("_stpre", "_ntpre")) -
      (mean("_scpost", "_ncpost") - mean("_scpre", "_ncpre"))
    agg.select(
      round(mean("_stpre", "_ntpre"), 6).as("treat_pre"),
      round(mean("_stpost", "_ntpost"), 6).as("treat_post"),
      round(mean("_scpre", "_ncpre"), 6).as("control_pre"),
      round(mean("_scpost", "_ncpost"), 6).as("control_post"),
      round(when(col("_ntpre") > 0 && col("_ntpost") > 0 &&
        col("_ncpre") > 0 && col("_ncpost") > 0, did), 6).as("did"))
  }

  /** CUPED variance reduction (Deng et al., public): adjust each
    * unit's experiment-period metric with its PRE-period covariate,
    * y* = y − θ·(x − x̄), θ = cov(x, y)/var(x) — the standard trick
    * that cuts A/B variance by the covariate's R² without biasing
    * the treatment contrast (θ and x̄ are treatment-blind). Returns
    * one row per unit: (key, y, y_adj, theta) — feed y_adj to
    * [[abTest]] in place of y.
    *
    * Exactness: all five moments accumulate exactly (int64 counts
    * and sums, decimal(38,0) products of cent-quantized pairs); θ
    * and x̄ are correctly-rounded doubles on identical operands
    * broadcast to every row; each y* is three more ops. Zero
    * pre-period variance ⇒ null adjustment (nothing to regress on).
    *
    * Scale shape: one co-partitioned (key) join of the two period
    * tables, one moment agg reduced to a 1-row broadcast, one
    * scan-speed projection. */
  def cuped(pre: DataFrame, post: DataFrame, keyCol: String,
            preMetric: Column, postMetric: Column,
            scale: Long = 100L): DataFrame = {
    def q(c: Column) = floor(c.cast("double") * scale + lit(0.5)).cast("long")
    val px = pre.filter(col(keyCol).isNotNull && preMetric.isNotNull)
      .groupBy(col(keyCol)).agg(sum(q(preMetric)).as("_x"))
    val py = post.filter(col(keyCol).isNotNull && postMetric.isNotNull)
      .groupBy(col(keyCol)).agg(sum(q(postMetric)).as("_y"))
    val joined = px.join(py, Seq(keyCol))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = broadcast(joined.agg(count(lit(1)).as("_n"),
      sum("_x").as("_sx"), sum("_y").as("_sy"),
      sum(dec(col("_x")) * col("_y")).as("_sxy"),
      sum(dec(col("_x")) * col("_x")).as("_sxx")))
    val nD = col("_n").cast("double")
    val varX = col("_sxx").cast("double") - col("_sx").cast("double") *
      col("_sx") / nD
    val covXY = col("_sxy").cast("double") - col("_sx").cast("double") *
      col("_sy") / nD
    val theta = covXY / varX
    val xbar = col("_sx").cast("double") / nD
    joined.crossJoin(m)
      .select(col(keyCol),
        round(col("_y").cast("double") / scale, 6).as("y"),
        round(when(varX > 0,
          (col("_y") - theta * (col("_x") - xbar)) / scale), 6).as("y_adj"),
        round(when(varX > 0, theta), 6).as("theta"))
  }

  /** Simpson's-paradox detector: per-stratum A-vs-B success-rate
    * differences alongside the AGGREGATE difference, with a flag on
    * every stratum whose direction CONTRADICTS the aggregate — the
    * "your topline A/B read is a composition artifact" alarm that
    * belongs next to any [[abTest]] readout. Strata missing an arm
    * are dropped (no rate to compare), not zero-filled.
    *
    * Exactness: all counts exact int64 from ONE conditional-sum agg;
    * rates/diffs are single divisions on identical operands; the
    * flip test compares those exact doubles to zero.
    *
    * Scale shape: one stratum-key agg with map-side combine; the
    * aggregate row is a 1-row broadcast re-derived from the SAME
    * stratum table (no second scan). */
  def simpsonFlip(df: DataFrame, stratumCol: String, inA: Column,
                  success: Column): DataFrame = {
    val base = df.filter(col(stratumCol).isNotNull)
      .select(col(stratumCol).as("_st"),
        when(inA, 1L).otherwise(0L).as("_a"),
        when(success, 1L).otherwise(0L).as("_s"))
    val st = base.groupBy("_st")
      .agg(sum("_a").as("_na"),
        sum(col("_a") * col("_s")).as("_sa"),
        sum(lit(1L) - col("_a")).as("_nb"),
        sum((lit(1L) - col("_a")) * col("_s")).as("_sb"))
    val tot = broadcast(st.agg(sum("_na").as("_tna"), sum("_sa").as("_tsa"),
      sum("_nb").as("_tnb"), sum("_sb").as("_tsb")))
    val rA = col("_sa").cast("double") / col("_na")
    val rB = col("_sb").cast("double") / col("_nb")
    val aggDiff = col("_tsa").cast("double") / col("_tna") -
      col("_tsb").cast("double") / col("_tnb")
    val diff = rA - rB
    st.filter(col("_na") > 0 && col("_nb") > 0)
      .crossJoin(tot)
      .select(col("_st").as(stratumCol),
        (col("_na") + col("_nb")).as("n"),
        round(rA, 6).as("rate_a"), round(rB, 6).as("rate_b"),
        round(diff, 6).as("diff"), round(aggDiff, 6).as("agg_diff"),
        ((diff > 0 && aggDiff < 0) || (diff < 0 && aggDiff > 0))
          .as("flipped"))
  }

  /** EXACT per-group percentiles at integer-arithmetic ranks: for
    * each requested percent p, the value at rank ⌈n·p/100⌉ =
    * (n·p + 99) div 100 of the group's sorted `scale`-quantized
    * metric — the deterministic companion to the mergeable-but-
    * approximate histogram sketches ([[Sketches]]): exact answers
    * where groups fit a sort partition, sketches where they don't
    * (the documented trade, both directions). One row per group:
    * n, then one column per percent (`p10`, `p50`, …), descaled.
    *
    * Exactness: rank selection is INTEGER arithmetic on the exact
    * count (an FP ⌈n·0.1⌉ flips at exact multiples across engines —
    * the q217/q244 lesson); ties broken by the caller's tiebreak
    * columns so the selected ROW, not just the value, is pinned.
    *
    * Scale shape: one group-partitioned sort window + one map-side-
    * combinable agg riding the same key exchange. */
  def exactPercentilesBy(df: DataFrame, groupCol: String,
                         valueCol: Column, tiebreak: Seq[Column],
                         percents: Seq[Int] = Seq(10, 50, 90),
                         scale: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val tbCols = tiebreak.zipWithIndex.map { case (c, i) => c.as(s"_tb$i") }
    val w = Window.partitionBy("_g").orderBy(
      col("_q") +: tiebreak.indices.map(i => col(s"_tb$i")): _*)
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(Seq(col(groupCol).as("_g"), q.as("_q")) ++ tbCols: _*)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("_g")))
    val picks = percents.map { p =>
      round(max(when(col("_rn") === expr(s"(_n * $p + 99) div 100"),
        col("_q"))).cast("double") / scale, 6).as(s"p$p")
    }
    base.groupBy(col("_g").as(groupCol))
      .agg(max("_n").as("n"), picks: _*)
  }

  /** Per-key behavioral entropy: Shannon entropy of each key's
    * categorical mix, normalized by ln(k) to [0,1] — the diversity
    * segmentation read ("one-trick users" near 0, uniform explorers
    * near 1), with the dominant category and its share alongside so
    * the low-entropy keys are immediately explainable. One row per
    * key: n, n_cats, entropy, entropy_norm (null when only one
    * category — nothing to normalize), top share.
    *
    * Exactness: (key, category) counts are exact int64; each
    * entropy term is correctly-rounded double ops on identical
    * operands, summed over the category-bounded group (round-6
    * absorbs order); the dominant category rides max(struct) =
    * arg_max with a deterministic count-then-name order.
    *
    * Scale shape: one reduced (key, category) shuffle, one key agg
    * riding the same partitioning. Nothing global. */
  def behavioralEntropy(df: DataFrame, keyCol: String,
                        catCol: String): DataFrame = {
    val c = df.filter(col(keyCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(keyCol).as("_k"), col(catCol).as("_c"))
      .agg(count(lit(1)).as("_n"))
    val wk = org.apache.spark.sql.expressions.Window.partitionBy("_k")
    val p = col("_n").cast("double") / col("_tot")
    c.withColumn("_tot", sum("_n").over(wk))
      .groupBy(col("_k"))
      .agg(max("_tot").as("n"), count(lit(1)).as("n_cats"),
        sum(-p * log(p)).as("_h"),
        max(struct(col("_n"), col("_c"))).as("_top"))
      .select(col("_k").as(keyCol), col("n"), col("n_cats"),
        // + 0.0 canonicalizes the single-category -0.0 (sum of
        // -1·ln 1 terms) to +0.0 on every engine
        (round(col("_h"), 6) + lit(0.0)).as("entropy"),
        round(when(col("n_cats") > 1,
          col("_h") / log(col("n_cats").cast("double"))), 6)
          .as("entropy_norm"),
        round(col("_top._n").cast("double") / col("n"), 6).as("top_share"))
  }

  /** OLS regression (two features + intercept) with a FIT/APPLY
    * split: the normal equations' 3×3 system is assembled from ONE
    * moment aggregation over the fit slice and solved in closed form
    * (Cramer's rule), then the coefficient row broadcasts into a
    * scan-speed predict/residual projection over the apply slice —
    * the leakage-aware linear-baseline fit ([[Curation.standardScaler]]'s
    * big sibling). Degenerate fits (singular system — collinear or
    * constant features) yield null predictions, not garbage betas.
    *
    * Exactness: callers pass INTEGER-quantized y/x1/x2, so all nine
    * moments (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y) are
    * exact int64 and order-free; every determinant is a fixed
    * arithmetic expression over those nine integers evaluated in
    * double — identical operands, identical result, any engine, any
    * partitioning. More features ⇒ the [[graft.plans.GramAggregate]]
    * + driver-solve posture PCA uses (documented path, not this
    * closed form).
    *
    * Scale shape: one map-side-combined moment agg reduced to a
    * 1-row broadcast; apply never shuffles. */
  def olsFitApply(fit: DataFrame, apply: DataFrame, yCol: Column,
                  x1Col: Column, x2Col: Column,
                  idCols: Seq[Column], scale: Long = 100L): DataFrame = {
    require(scale >= 1)
    def q(c: Column) = floor(c.cast("double") * scale + lit(0.5)).cast("long")
    val m = fit.filter(yCol.isNotNull && x1Col.isNotNull && x2Col.isNotNull)
      .select(q(yCol).as("_y"), q(x1Col).as("_x1"), q(x2Col).as("_x2"))
      .agg(count(lit(1)).as("_n"), sum("_x1").as("_a"), sum("_x2").as("_b"),
        sum(col("_x1") * col("_x1")).as("_c"),
        sum(col("_x1") * col("_x2")).as("_d"),
        sum(col("_x2") * col("_x2")).as("_e"),
        sum("_y").as("_t0"), sum(col("_x1") * col("_y")).as("_t1"),
        sum(col("_x2") * col("_y")).as("_t2"))
    val d = (c: String) => col(c).cast("double")
    val (n, a, b) = (d("_n"), d("_a"), d("_b"))
    val (c3, dd, e) = (d("_c"), d("_d"), d("_e"))
    val (t0, t1, t2) = (d("_t0"), d("_t1"), d("_t2"))
    val det = n * (c3 * e - dd * dd) - a * (a * e - dd * b) +
      b * (a * dd - c3 * b)
    val det0 = t0 * (c3 * e - dd * dd) - a * (t1 * e - dd * t2) +
      b * (t1 * dd - c3 * t2)
    val det1 = n * (t1 * e - dd * t2) - t0 * (a * e - dd * b) +
      b * (a * t2 - t1 * b)
    val det2 = n * (c3 * t2 - t1 * dd) - a * (a * t2 - t1 * b) +
      t0 * (a * dd - c3 * b)
    val coefs = broadcast(m.select(
      when(det =!= 0, det0 / det).as("_b0"),
      when(det =!= 0, det1 / det).as("_b1"),
      when(det =!= 0, det2 / det).as("_b2")))
    val yhat = col("_b0") + col("_b1") * q(x1Col) + col("_b2") * q(x2Col)
    apply.filter(yCol.isNotNull && x1Col.isNotNull && x2Col.isNotNull)
      .crossJoin(coefs)
      .select(idCols ++ Seq(
        round(q(yCol).cast("double") / scale, 6).as("y"),
        round(yhat / scale, 6).as("pred"),
        round((q(yCol) - yhat) / scale, 6).as("resid")): _*)
  }

  /** Two-sample log-rank test on right-censored durations: do the A
    * and B survival curves differ — the censoring-aware A/B read
    * [[kaplanMeier]] draws but doesn't TEST (a naive mean-duration
    * t-test is biased the moment censoring differs between arms).
    * At each pooled event time: observed A-events vs the
    * hypergeometric expectation d·n_A/n and variance
    * d·(n_A/n)(1−n_A/n)(n−d)/(n−1); χ² = (O−E)²/V, df 1, signed z.
    *
    * Determinism: at-risk and event counts are exact integers (the
    * [[kaplanMeier]] cumulative bookkeeping, pivoted to one row per
    * pooled time); each per-time E and V is a fixed double over
    * those integers, ×10⁶-quantized to int64 and summed as
    * decimal(38,0) — order-free — meeting in one final assembly.
    * Times with n ≤ 1 contribute zero variance via a NULL-divisor
    * guard. NULL χ²/z when either arm is empty or ΣV = 0.
    *
    * Returns one row (n_a, n_b, o_a, e_a, chi2, z).
    *
    * Scale shape: one (arm, t) reduced shuffle, a 1-row totals
    * broadcast, then ONE window over the pooled distinct event
    * times — duration grids are value-cardinality-sized (days,
    * buckets), not row-sized; if a duration domain ever outgrew a
    * task the established histogram-sketch bucketing applies. */
  def logRank(df: DataFrame, isArmA: Column, durCol: Column,
              observedCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = df.filter(isArmA.isNotNull && durCol.isNotNull)
      .select(isArmA.as("_a"), durCol.cast("long").as("_t"),
        when(observedCol, lit(1L)).otherwise(lit(0L)).as("_d"))
    val c = base.groupBy(col("_t"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("_ca"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("_cb"),
        sum(when(col("_a"), col("_d")).otherwise(0L)).as("_da"),
        sum(when(!col("_a"), col("_d")).otherwise(0L)).as("_db"))
    val tot = c.agg(sum("_ca").as("_ta"), sum("_cb").as("_tb"))
    val prev = Window.orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = c.crossJoin(broadcast(tot))
      .withColumn("_na", col("_ta") - coalesce(sum("_ca").over(prev),
        lit(0L)))
      .withColumn("_nb", col("_tb") - coalesce(sum("_cb").over(prev),
        lit(0L)))
      .filter(col("_da") + col("_db") > 0)
    val n = (col("_na") + col("_nb")).cast("double")
    val dt = (col("_da") + col("_db")).cast("double")
    val pa = col("_na").cast("double") / n
    val e = dt * pa
    val v = dt * pa * (lit(1.0) - pa) *
      ((n - dt) / when(n - 1 > 0, n - 1))
    val terms = grid.select(col("_da"),
      floor(e * 1e6 + lit(0.5)).cast("long").cast(dec).as("_eq"),
      floor(v * 1e6 + lit(0.5)).cast("long").cast(dec).as("_vq"))
    val agg = terms.agg(sum("_da").as("o_a"), sum("_eq").as("_se"),
      sum("_vq").as("_sv")).crossJoin(broadcast(tot))
    val ed = col("_se").cast("double") / 1e6
    val vd = col("_sv").cast("double") / 1e6
    val z = (col("o_a").cast("double") - ed) / sqrt(when(vd > 0, vd))
    val ok = col("_ta") > 0 && col("_tb") > 0 && vd > 0
    agg.select(col("_ta").as("n_a"), col("_tb").as("n_b"), col("o_a"),
      round(when(col("_ta") > 0 && col("_tb") > 0, ed), 6).as("e_a"),
      round(when(ok, z * z), 6).as("chi2"),
      round(when(ok, z), 6).as("z"))
  }

  /** Welch's t-test + effect sizes between two slices: the unequal-
    * variance two-sample mean comparison (t, Satterthwaite df) plus
    * Cohen's d on the pooled SD and its small-sample Hedges' g
    * correction g = d·(1 − 3/(4(n₁+n₂)−9)) — the parametric
    * companion to [[mannWhitneyU]] that also SIZES the difference
    * (a tiny p with a negligible d is the classic big-data trap).
    *
    * Exactness: per-slice n/Σy/Σy² are exact int64/decimal(38,0)
    * from the integer-quantized value; means, sample variances
    * (n−1), t, df, d, g are ONE fixed double assembly over them.
    * NULL when either slice has n < 2 or both variances are 0.
    *
    * Returns one row (n_a, n_b, mean_a, mean_b, t, df, cohen_d,
    * hedges_g).
    *
    * Scale shape: ONE map-side-combinable two-group agg (the slice
    * flag is the grouping key), then a 1×1 self-assembly — the
    * cheapest distributed shape, like [[jarqueBera]]. */
  def welchTTest(df: DataFrame, isSliceA: Column,
                 valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val y = valueCol.cast("long")
    val m = df.filter(isSliceA.isNotNull && valueCol.isNotNull)
      .groupBy(isSliceA.as("_a"))
      .agg(count(lit(1)).as("_n"), sum(y.cast(dec)).as("_s"),
        sum((y * y).cast(dec)).as("_q"))
      .agg(max(when(col("_a"), col("_n"))).as("_na"),
        max(when(!col("_a"), col("_n"))).as("_nb"),
        max(when(col("_a"), col("_s"))).as("_sa"),
        max(when(!col("_a"), col("_s"))).as("_sb"),
        max(when(col("_a"), col("_q"))).as("_qa"),
        max(when(!col("_a"), col("_q"))).as("_qb"))
    def d(c: String) = col(c).cast("double")
    val (na, nb) = (d("_na"), d("_nb"))
    val ma = d("_sa") / na
    val mb = d("_sb") / nb
    // sample variance: (nΣy² − (Σy)²) / (n(n−1)) — exact numerator
    val va = (na * d("_qa") - d("_sa") * d("_sa")) /
      when(na * (na - 1) > 0, na * (na - 1))
    val vb = (nb * d("_qb") - d("_sb") * d("_sb")) /
      when(nb * (nb - 1) > 0, nb * (nb - 1))
    val se2 = va / na + vb / nb
    val t = (ma - mb) / sqrt(when(se2 > 0, se2))
    val dfW = se2 * se2 / when(
      va * va / (na * na * (na - 1)) + vb * vb / (nb * nb * (nb - 1)) > 0,
      va * va / (na * na * (na - 1)) + vb * vb / (nb * nb * (nb - 1)))
    val sp2 = ((na - 1) * va + (nb - 1) * vb) /
      when(na + nb - 2 > 0, na + nb - 2)
    val cd = (ma - mb) / sqrt(when(sp2 > 0, sp2))
    val g = cd * (lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9))
    val ok = col("_na") >= 2 && col("_nb") >= 2 && se2 > 0
    m.select(col("_na").as("n_a"), col("_nb").as("n_b"),
      round(when(col("_na") >= 1, ma), 6).as("mean_a"),
      round(when(col("_nb") >= 1, mb), 6).as("mean_b"),
      round(when(ok, t), 6).as("t"),
      round(when(ok, dfW), 6).as("df"),
      round(when(ok && sp2 > 0, cd), 6).as("cohen_d"),
      round(when(ok && sp2 > 0, g), 6).as("hedges_g"))
  }

  /** Bartlett's test of variance homogeneity across k groups:
    * χ² = [(N−k)·ln s²_p − Σ(nᵢ−1)·ln s²ᵢ] / C with the standard
    * correction C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)) — the
    * normal-theory companion to the median-based Brown–Forsythe
    * already registered: more powerful when the data IS normal
    * (q395's Jarque–Bera decides which to trust), fragile when not.
    *
    * Exactness: per-group (nᵢ−1)s²ᵢ = (nᵢΣy²−(Σy)²)/nᵢ and the
    * per-group ln/1-over terms are fixed doubles over exact int
    * moments, each ×10⁶/×10¹²-quantized to int64 BEFORE the k-row
    * sums (order-free decimal(38,0)); the final χ² is one fixed
    * assembly. NULL when k < 2, any nᵢ < 2, or any zero group
    * variance (ln undefined — use Brown–Forsythe there).
    *
    * Returns one row (k, n, chi2, df).
    *
    * Scale shape: ONE map-side-combinable group-moment agg, then a
    * k-row reduction to one row — [[jarqueBera]]'s cost class. */
  def bartlett(df: DataFrame, groupCol: String,
               valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val y = valueCol.cast("long")
    val g = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(y.cast(dec)).as("_s"),
        sum((y * y).cast(dec)).as("_q"))
    val nd = col("_n").cast("double")
    val ssn = (col("_n").cast(dec) * col("_q") - col("_s") * col("_s"))
      .cast("double")
    // (nᵢ−1)s²ᵢ and s²ᵢ as fixed doubles over exact ints
    val pool = ssn / nd
    val vi = ssn / nd / when(nd - 1 > 0, nd - 1)
    val terms = g.select(col("_n"),
      floor(pool * 1e6 + lit(0.5)).cast("long").cast(dec).as("_pq"),
      floor((nd - 1) * log(when(vi > 0, vi)) * 1e12 + lit(0.5))
        .cast("long").cast(dec).as("_lq"),
      floor(lit(1e12) / when(nd - 1 > 0, nd - 1) + lit(0.5))
        .cast("long").cast(dec).as("_iq"),
      when(vi > 0 && col("_n") >= 2, 1L).otherwise(0L).as("_okg"))
    val a = terms.agg(count(lit(1)).as("_k"), sum("_n").as("_nn"),
      sum("_pq").as("_sp"), sum("_lq").as("_sl"), sum("_iq").as("_si"),
      min("_okg").as("_allok"))
    val kd = col("_k").cast("double")
    val ndd = col("_nn").cast("double")
    val nmk = ndd - kd
    val sp2 = col("_sp").cast("double") / 1e6 / when(nmk > 0, nmk)
    val t1 = nmk * log(when(sp2 > 0, sp2))
    val t2 = col("_sl").cast("double") / 1e12
    val c = lit(1.0) + (col("_si").cast("double") / 1e12 -
      lit(1.0) / when(nmk > 0, nmk)) / (lit(3.0) * (kd - 1))
    val chi2 = (t1 - t2) / when(c =!= 0, c)
    val ok = col("_k") >= 2 && col("_allok") === 1
    a.select(col("_k").as("k"), col("_nn").as("n"),
      round(when(ok, chi2), 6).as("chi2"),
      (col("_k") - 1).as("df"))
  }

  /** Q–Q line fit between two samples: the OLS line through the
    * paired deciles (B's quantiles on A's) — slope ≈ scale ratio,
    * intercept ≈ location shift, r ≈ "is the Q–Q plot straight"
    * (straight-but-tilted = same family different parameters; bent =
    * different shape). The three-number summary of the Q–Q plot
    * analysts eyeball, computable where no one can eyeball 10⁹ rows.
    *
    * Exactness: both decile vectors are exact interpolated
    * percentiles (= DuckDB `quantile_cont` — cross-engine-identical
    * doubles), ×10⁶-quantized to int64; the 9-point OLS runs as a
    * FIXED left-associated double chain — no distributed float sum,
    * no past-2⁵³ conversion (the q413 rule). NULL
    * when either side is empty or A's deciles are all equal.
    *
    * Returns one row (n_a, n_b, qq_slope, qq_intercept, qq_r).
    *
    * Scale shape: two exact-percentile aggs (the [[kruskalWallis]]
    * family's cost), one 1-row cross, a constant 9-term assembly. */
  def qqFit(df: DataFrame, isSliceA: Column,
            valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val ps = (1 to 9).map(_ / 10.0)
    val base = df.filter(isSliceA.isNotNull && valueCol.isNotNull)
      .select(isSliceA.as("_g"), valueCol.cast("long").as("_v"))
    val qs = base.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"),
        expr(s"percentile(_v, array(${ps.mkString(", ")}))").as("_q"))
    val one = qs.agg(
      max(when(col("_g"), col("_n"))).as("n_a"),
      max(when(!col("_g"), col("_n"))).as("n_b"),
      max(when(col("_g"), col("_q"))).as("_qa"),
      max(when(!col("_g"), col("_q"))).as("_qb"))
    // quantize each decile to int64, then assemble ENTIRELY in double
    // arithmetic with a fixed 9-term chain (the q413 rule: no
    // past-2^53 decimal->double conversion anywhere; IEEE ops on
    // identical operands are engine-identical)
    def el(arr: String, i: Int) =
      floor(element_at(col(arr), i) * 1e6 + lit(0.5)).cast("long")
        .cast("double")
    val xs = (1 to 9).map(el("_qa", _))
    val ys = (1 to 9).map(el("_qb", _))
    val p = lit(9.0)
    val sx = xs.reduce(_ + _)
    val sy = ys.reduce(_ + _)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.reduce(_ + _)
    val sxx = xs.map(x => x * x).reduce(_ + _)
    val syy = ys.map(y => y * y).reduce(_ + _)
    val den = p * sxx - sx * sx
    val slope = (p * sxy - sx * sy) / when(den > 0, den)
    val icept = (sy - slope * sx) / lit(9.0) / 1e6
    val rDen = den * (p * syy - sy * sy)
    val r = (p * sxy - sx * sy) / sqrt(when(rDen > 0, rDen))
    val ok = col("n_a") > 0 && col("n_b") > 0
    one.select(col("n_a"), col("n_b"),
      round(when(ok, slope), 6).as("qq_slope"),
      round(when(ok, icept), 6).as("qq_intercept"),
      round(when(ok, r), 6).as("qq_r"))
  }

  /** Mantel–Haenszel pooled odds ratio across strata: the stratified
    * 2×2 combiner — OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ) — with the
    * Robins–Breslow–Greenland variance of ln OR for a 95% CI. THE
    * confounder-adjusted association read: a crude 2×2 can show an
    * effect that vanishes (or reverses — Simpson) once the stratum
    * variable is held fixed; MH pools the per-stratum effects
    * without fitting a model. Zero-margin strata contribute nothing
    * (standard).
    *
    * Exactness: per-stratum cell counts are exact int64; each
    * rational term (ad/n, bc/n, and the three RBG component
    * products) is ×10⁹-quantized to int64 and summed as
    * decimal(38,0); OR, ln OR, the RBG variance and the CI are one
    * fixed double assembly. NULL when either pooled sum is 0.
    *
    * Returns one row (n_strata, n, or_mh, ci_lo, ci_hi).
    *
    * Scale shape: one reduced (stratum) shuffle of four conditional
    * sums, then strata-sized quantized terms reduced to 1 row. */
  def mantelHaenszel(df: DataFrame, stratumCol: Column,
                     exposedCol: Column, outcomeCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.filter(stratumCol.isNotNull && exposedCol.isNotNull &&
        outcomeCol.isNotNull)
      .select(stratumCol.as("_s"), exposedCol.as("_e"), outcomeCol.as("_o"))
    val cells = base.groupBy(col("_s")).agg(
      sum(when(col("_e") && col("_o"), 1L).otherwise(0L)).as("_a"),
      sum(when(col("_e") && !col("_o"), 1L).otherwise(0L)).as("_b"),
      sum(when(!col("_e") && col("_o"), 1L).otherwise(0L)).as("_c"),
      sum(when(!col("_e") && !col("_o"), 1L).otherwise(0L)).as("_d"))
    val n = (col("_a") + col("_b") + col("_c") + col("_d")).cast("double")
    def qq(c: Column) = floor(c * 1e9 + lit(0.5)).cast("long").cast(dec)
    val r = col("_a").cast("double") * col("_d").cast("double") / n
    val s = col("_b").cast("double") * col("_c").cast("double") / n
    val p = (col("_a") + col("_d")).cast("double") / n
    val q2 = (col("_b") + col("_c")).cast("double") / n
    val terms = cells.filter(col("_a") + col("_b") + col("_c") +
        col("_d") > 0)
      .select(qq(r).as("_r"), qq(s).as("_sq"),
        qq(p * r).as("_pr"),
        qq(p * s + q2 * r).as("_psqr"),
        qq(q2 * s).as("_qs"),
        (col("_a") + col("_b") + col("_c") + col("_d")).as("_nn"))
    val a = terms.agg(count(lit(1)).as("n_strata"), sum("_nn").as("n"),
      sum("_r").as("_sr"), sum("_sq").as("_ss"), sum("_pr").as("_spr"),
      sum("_psqr").as("_spsqr"), sum("_qs").as("_sqs"))
    def d(c: String) = col(c).cast("double") / 1e9
    val orMh = d("_sr") / when(d("_ss") > 0, d("_ss"))
    // RBG: var(ln OR) = ΣPR/(2(ΣR)²) + Σ(PS+QR)/(2ΣRΣS) + ΣQS/(2(ΣS)²)
    val vLn = d("_spr") / (lit(2.0) * d("_sr") * d("_sr")) +
      d("_spsqr") / (lit(2.0) * d("_sr") * d("_ss")) +
      d("_sqs") / (lit(2.0) * d("_ss") * d("_ss"))
    val ok = col("_sr") > 0 && col("_ss") > 0
    val lnOr = log(when(orMh > 0, orMh))
    a.select(col("n_strata"), col("n"),
      round(when(ok, orMh), 6).as("or_mh"),
      round(when(ok, exp(lnOr - lit(1.959964) * sqrt(when(vLn > 0, vLn)))),
        6).as("ci_lo"),
      round(when(ok, exp(lnOr + lit(1.959964) * sqrt(when(vLn > 0, vLn)))),
        6).as("ci_hi"))
  }

  /** Two-sample energy distance (Székely–Rizzo):
    * E = 2·E|X−Y| − E|X−X′| − E|Y−Y′| — the distribution-equality
    * statistic that is zero IFF the distributions match, sensitive
    * to ANY difference (location, scale, shape) where KS keys on
    * the single worst CDF gap and t-tests see only means. Each mean
    * absolute difference is computed EXACTLY from the merged
    * distinct-value grid: Σ pairs |u−v|·cnt·cnt via prefix
    * count/moment sums — no pair join, no sampling.
    *
    * Exactness: values are integer-quantized; every pair-mass term
    * v·A<(v) − S<(v) and its count weight is exact
    * int64/decimal(38,0); the three means divide exact integers in
    * one fixed assembly. NULL when either side is empty.
    *
    * Returns one row (n_a, n_b, mu_xy, mu_xx, mu_yy, energy_dist).
    *
    * Scale shape: one reduced (value) shuffle, prefix sums via ONE
    * window over DISTINCT values (value-cardinality-sized, the q391
    * posture), one 1-row agg. */
  def energyDistance(df: DataFrame, isSliceA: Column,
                     valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = df.filter(isSliceA.isNotNull && valueCol.isNotNull)
      .select(isSliceA.as("_g"), valueCol.cast("long").as("_v"))
    val grid = base.groupBy(col("_v")).agg(
      sum(when(col("_g"), 1L).otherwise(0L)).as("_ca"),
      sum(when(!col("_g"), 1L).otherwise(0L)).as("_cb"))
    val prev = Window.orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val g2 = grid
      .withColumn("_pa", coalesce(sum("_ca").over(prev), lit(0L)))
      .withColumn("_pb", coalesce(sum("_cb").over(prev), lit(0L)))
      .withColumn("_sa", coalesce(sum((col("_v") * col("_ca")).cast(dec))
        .over(prev), lit(0L).cast(dec)))
      .withColumn("_sb", coalesce(sum((col("_v") * col("_cb")).cast(dec))
        .over(prev), lit(0L).cast(dec)))
    // pair mass against EARLIER values only (equal values add 0)
    val mxy = (col("_cb").cast(dec) *
        (col("_v").cast(dec) * col("_pa") - col("_sa"))) +
      (col("_ca").cast(dec) *
        (col("_v").cast(dec) * col("_pb") - col("_sb")))
    val mxx = col("_ca").cast(dec) *
      (col("_v").cast(dec) * col("_pa") - col("_sa"))
    val myy = col("_cb").cast(dec) *
      (col("_v").cast(dec) * col("_pb") - col("_sb"))
    val a = g2.agg(sum("_ca").as("n_a"), sum("_cb").as("n_b"),
      sum(mxy).as("_mxy"), sum(mxx).as("_mxx"), sum(myy).as("_myy"))
    def d(c: Column) = c.cast("double")
    val (na, nb) = (d(col("n_a")), d(col("n_b")))
    val muXy = d(col("_mxy")) / when(na * nb > 0, na * nb)
    val muXx = lit(2.0) * d(col("_mxx")) / when(na * na > 0, na * na)
    val muYy = lit(2.0) * d(col("_myy")) / when(nb * nb > 0, nb * nb)
    val ok = col("n_a") > 0 && col("n_b") > 0
    a.select(col("n_a"), col("n_b"),
      round(when(ok, muXy), 6).as("mu_xy"),
      round(when(ok, muXx), 6).as("mu_xx"),
      round(when(ok, muYy), 6).as("mu_yy"),
      round(when(ok, lit(2.0) * muXy - muXx - muYy), 6)
        .as("energy_dist"))
  }

  /** OLS influence diagnostics: per-row leverage hᵢ = vᵢᵀM⁻¹vᵢ
    * (v = (1, x₁, x₂), M = XᵀX via its six cofactors — closed form
    * over [[olsFitApply]]'s nine exact moments) and Cook's distance
    * Dᵢ = eᵢ²hᵢ/(p·s²·(1−hᵢ)²) — WHICH rows steer the fit, the
    * diagnostic that turns "the slope moved" into "these 20 records
    * moved it". Returns the top-k by D (quantized total order).
    *
    * Determinism: moments and residual quantization follow
    * [[olsFitApply]] exactly; SSE accumulates as ×1-quantized int64
    * squared cent residuals in decimal(38,0); h and D are fixed
    * double assemblies; the top-k orders by ⌊D·10¹²+½⌋ with id
    * tiebreaks. Singular fits yield zero rows.
    *
    * Scale shape: one moment agg (1-row broadcast), one scan
    * computing e/h/D per row (no join wider than the broadcast),
    * one TakeOrderedAndProject. */
  def olsInfluence(df: DataFrame, yCol: Column, x1Col: Column,
                   x2Col: Column, idCols: Seq[Column],
                   scale: Long = 100L, topK: Int = 20): DataFrame = {
    require(scale >= 1 && topK >= 1)
    val dec = "decimal(38,0)"
    def q(c: Column) = floor(c.cast("double") * scale + lit(0.5))
      .cast("long")
    val base = df.filter(yCol.isNotNull && x1Col.isNotNull &&
      x2Col.isNotNull)
    val m = base
      .select(q(yCol).as("_y"), q(x1Col).as("_x1"), q(x2Col).as("_x2"))
      .agg(count(lit(1)).as("_n"), sum("_x1").as("_a"),
        sum("_x2").as("_b"),
        sum(col("_x1") * col("_x1")).as("_c"),
        sum(col("_x1") * col("_x2")).as("_d"),
        sum(col("_x2") * col("_x2")).as("_e"),
        sum("_y").as("_t0"), sum(col("_x1") * col("_y")).as("_t1"),
        sum(col("_x2") * col("_y")).as("_t2"))
    val dd = (c: String) => col(c).cast("double")
    val (n, a, b) = (dd("_n"), dd("_a"), dd("_b"))
    val (c3, d4, e5) = (dd("_c"), dd("_d"), dd("_e"))
    val (t0, t1, t2) = (dd("_t0"), dd("_t1"), dd("_t2"))
    val det = n * (c3 * e5 - d4 * d4) - a * (a * e5 - d4 * b) +
      b * (a * d4 - c3 * b)
    val det0 = t0 * (c3 * e5 - d4 * d4) - a * (t1 * e5 - d4 * t2) +
      b * (t1 * d4 - c3 * t2)
    val det1 = n * (t1 * e5 - d4 * t2) - t0 * (a * e5 - d4 * b) +
      b * (a * t2 - t1 * b)
    val det2 = n * (c3 * t2 - t1 * d4) - a * (a * t2 - t1 * b) +
      t0 * (a * d4 - c3 * b)
    // cofactors of M = [[n,a,b],[a,c,d],[b,d,e]] (symmetric)
    val c00 = c3 * e5 - d4 * d4
    val c01 = -(a * e5 - d4 * b)
    val c02 = a * d4 - c3 * b
    val c11 = n * e5 - b * b
    val c12 = -(n * d4 - a * b)
    val c22 = n * c3 - a * a
    val coefs = broadcast(m.select(col("_n"),
      when(det =!= 0, det0 / det).as("_b0"),
      when(det =!= 0, det1 / det).as("_b1"),
      when(det =!= 0, det2 / det).as("_b2"),
      when(det =!= 0, det).as("_det"),
      c00.as("_c00"), c01.as("_c01"), c02.as("_c02"),
      c11.as("_c11"), c12.as("_c12"), c22.as("_c22")))
    val x1q = q(x1Col).cast("double")
    val x2q = q(x2Col).cast("double")
    val yhat = col("_b0") + col("_b1") * q(x1Col) + col("_b2") * q(x2Col)
    val eRes = q(yCol).cast("double") - yhat
    val withE = base.crossJoin(coefs).filter(col("_det").isNotNull)
      .withColumn("_e2q", floor(eRes * eRes + lit(0.5)).cast("long"))
      .withColumn("_h",
        (col("_c00") + lit(2.0) * col("_c01") * x1q +
          lit(2.0) * col("_c02") * x2q + col("_c11") * x1q * x1q +
          lit(2.0) * col("_c12") * x1q * x2q +
          col("_c22") * x2q * x2q) / col("_det"))
    val sse = withE.agg(sum(col("_e2q").cast(dec)).as("_sse"))
    val s2 = col("_sse").cast("double") /
      when(col("_n") - 3 > 0, (col("_n") - 3).cast("double"))
    val cook = col("_e2q").cast("double") * col("_h") /
      when(lit(3.0) * col("_s2") * (lit(1.0) - col("_h")) *
        (lit(1.0) - col("_h")) > 0,
        lit(3.0) * col("_s2") * (lit(1.0) - col("_h")) *
          (lit(1.0) - col("_h")))
    withE.crossJoin(broadcast(sse))
      .withColumn("_s2", s2)
      .withColumn("_cook", cook)
      .withColumn("_ck", floor(col("_cook") * 1e12 + lit(0.5))
        .cast("long"))
      .orderBy(col("_ck").desc +: idCols.map(_.asc): _*)
      .limit(topK)
      .select(idCols ++ Seq(
        round(eRes / scale, 6).as("resid"),
        round(col("_h"), 6).as("leverage"),
        round(col("_cook"), 6).as("cooks_d")): _*)
  }

  /** Operating-point selection: the decision threshold that
    * maximizes F1 over the exact threshold sweep — the missing step
    * between q195's AUC (threshold-free ranking quality) and a
    * deployable classifier (ONE cutoff ships). At every distinct
    * score taken as "predict positive when score ≥ t": cumulative
    * tp/fp from one descending pass, fn = P − tp, F1 = 2tp/(2tp+fp+fn);
    * the argmax breaks F1 ties toward the HIGHER threshold (predict
    * positive less often at equal F1).
    *
    * Exactness: counts are exact int64; F1 is compared via its
    * ×10¹²-quantized value so the argmax is a total order
    * (f1q desc, threshold desc); the reported P/R/F1 divide exact
    * integers. Empty or all-negative inputs yield zero rows.
    *
    * Returns one row (threshold, tp, fp, fn, prec, rec, f1).
    *
    * Scale shape: one reduced (score) shuffle, cumulative window
    * over DISTINCT scores (value-cardinality-sized, the q391
    * posture), then a TakeOrderedAndProject top-1 — never a global
    * sort materialization. */
  def maxF1Threshold(df: DataFrame, scoreCol: Column,
                     positiveCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(scoreCol.isNotNull && positiveCol.isNotNull)
      .select(scoreCol.cast("long").as("_s"),
        when(positiveCol, 1L).otherwise(0L).as("_y"))
    val sc = base.groupBy(col("_s"))
      .agg(sum("_y").as("_pos"), count(lit(1)).as("_cnt"))
    val tot = broadcast(sc.agg(sum("_pos").as("_p")))
    val cum = Window.orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = sc.crossJoin(tot)
      .withColumn("tp", sum("_pos").over(cum))
      .withColumn("fp", sum("_cnt").over(cum) - col("tp"))
      .withColumn("fn", col("_p") - col("tp"))
    val den = lit(2L) * col("tp") + col("fp") + col("fn")
    val f1 = lit(2.0) * col("tp") / when(den > 0, den.cast("double"))
    c.filter(col("_p") > 0)
      .withColumn("_f1q",
        floor(f1 * 1e12 + lit(0.5)).cast("long"))
      .orderBy(col("_f1q").desc, col("_s").desc)
      .limit(1)
      .select(col("_s").as("threshold"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast("double") /
          when(col("tp") + col("fp") > 0,
            (col("tp") + col("fp")).cast("double")), 6).as("prec"),
        round(col("tp").cast("double") /
          when(col("_p") > 0, col("_p").cast("double")), 6).as("rec"),
        round(f1, 6).as("f1"))
  }

  /** Bowker's symmetry test on a paired k×k labeling: did the
    * confusion between two labelers/model versions move
    * ASYMMETRICALLY — χ² = Σᵢ<ⱼ (nᵢⱼ−nⱼᵢ)²/(nᵢⱼ+nⱼᵢ), df = the
    * non-empty pair count (McNemar's k×k generalization; q354's
    * agreement report says HOW MUCH the labelings agree, Bowker
    * says whether the disagreements have a DIRECTION — the
    * model-regression smell when v2 drains one class into another).
    * Diagonal cells never enter; empty pairs (both directions 0)
    * contribute nothing and don't count toward df.
    *
    * Exactness: cell counts are exact int64; each pair's rational
    * term is ×10⁹-quantized to int64 and summed as decimal(38,0) —
    * order-free; one division back at the end. NULL when no
    * non-empty off-diagonal pair exists.
    *
    * Returns one row (k, n, chi2, df).
    *
    * Scale shape: ONE reduced (a, b) cell shuffle; the pair join is
    * cell-table-sized (≤ k²), everything after is 1-row. */
  def bowkerTest(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.filter(aCol.isNotNull && bCol.isNotNull)
      .select(aCol.as("_a"), bCol.as("_b"))
    val cells = base.groupBy(col("_a"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val up = cells.filter(col("_a") < col("_b"))
      .select(col("_a").as("_i"), col("_b").as("_j"), col("_c").as("_cu"))
    val dn = cells.filter(col("_a") > col("_b"))
      .select(col("_b").as("_i"), col("_a").as("_j"), col("_c").as("_cd"))
    val pairs = up.join(dn, Seq("_i", "_j"), "full_outer")
      .select(coalesce(col("_cu"), lit(0L)).as("_u"),
        coalesce(col("_cd"), lit(0L)).as("_d"))
    val term = (col("_u") - col("_d")).cast("double") *
      (col("_u") - col("_d")).cast("double") /
      when(col("_u") + col("_d") > 0,
        (col("_u") + col("_d")).cast("double"))
    val agg = pairs.agg(
      sum(floor(term * 1e9 + lit(0.5)).cast("long").cast(dec)).as("_q"),
      sum(when(col("_u") + col("_d") > 0, 1L).otherwise(0L)).as("df"))
    val kk = base.select(col("_a").as("_l"))
      .union(base.select(col("_b")))
      .agg(countDistinct(col("_l")).as("_ka"))
    val nn = base.agg(count(lit(1)).as("n"))
    agg.crossJoin(broadcast(kk)).crossJoin(broadcast(nn))
      .select(col("_ka").as("k"), col("n"),
        round(when(col("df") > 0, col("_q").cast("double") / 1e9), 6)
          .as("chi2"),
        col("df"))
  }

  /** Restricted mean survival time to horizon τ: the area under the
    * [[kaplanMeier]] curve on [0, τ] — "expected survival time in
    * the first τ units", the modern effect measure that stays
    * defined when hazards cross or the tail is censored (a
    * difference in RMST between arms is directly interpretable in
    * TIME units, unlike a hazard ratio). Integrates the step
    * function exactly: the [0, t₁) segment at S = 1, then each
    * [tᵢ, tᵢ₊₁ ∧ τ) at S(tᵢ), stopping at τ.
    *
    * Exactness: KM survival values are round-6 (engine-identical);
    * each segment contribution rides as the exact int64
    * ⌊S·10⁶+½⌋·Δt (durations integer), summed as decimal(38,0) —
    * order-free — and divided back once. Groups whose first event
    * time exceeds τ report RMST = τ (whole window at S = 1).
    *
    * Returns one row per group (group, tau, rmst, n).
    *
    * Scale shape: [[kaplanMeier]]'s one reduced (group, t) shuffle +
    * window, then one more lead() over the SAME per-group ordering
    * and a map-side-combinable agg. */
  def rmst(df: DataFrame, groupCol: String, durCol: String,
           observedCol: Column, tau: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tau >= 1)
    val dec = "decimal(38,0)"
    val km = kaplanMeier(df, groupCol, durCol, observedCol)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(durCol))
    val sq = floor(col("survival") * 1e6 + lit(0.5)).cast("long")
    val seg = km
      .withColumn("_next", coalesce(lead(col(durCol), 1).over(w),
        lit(tau)))
      .withColumn("_t0", least(col(durCol).cast("long"), lit(tau)))
      .withColumn("_t1", least(greatest(col("_next").cast("long"),
        col(durCol).cast("long")), lit(tau)))
      .withColumn("_contrib",
        (sq * greatest(col("_t1") - col("_t0"), lit(0L))).cast(dec))
      .withColumn("_first", least(col(durCol).cast("long"), lit(tau)))
    val agg = seg.groupBy(col(groupCol))
      .agg(sum("_contrib").as("_sc"), min("_first").as("_f"),
        sum("n_events").as("_ne"), max("n_risk").as("n"))
    agg.select(col(groupCol), lit(tau).as("tau"),
      round((col("_f").cast(dec) * lit(1000000L) + col("_sc"))
        .cast("double") / 1e6, 6).as("rmst"),
      col("n"))
  }

  /** Qini uplift curve over scored units: rank by targeting score,
    * then per cumulative bucket compare treated vs control response
    * — q(d) = Rₜ(d) − R_c(d)·Nₜ(d)/N_c(d), the uplift-model audit
    * that plain response rates can't give (a model that targets
    * sure-things scores high on response and ZERO on qini). The
    * curve ENDS at the overall incremental-response estimate; a
    * random score walks a straight line to it.
    *
    * Determinism: the ranking is (quantized score desc, id) — a
    * total order — bucket boundaries are integer arithmetic
    * ((rank−1)·buckets div N), all cumulative counts are exact
    * int64, and each q(d) is one fixed double expression. Buckets
    * with no control yet report NULL qini.
    *
    * Returns one row per bucket (bucket, cum_n_treated,
    * cum_n_control, cum_resp_treated, cum_resp_control, qini).
    *
    * Scale shape: units are an already-reduced per-subject relation;
    * the global rank is ONE total-order window over units (the q382
    * posture — at population scale swap the bucket assignment to
    * histogram-sketch score quantiles, same downstream), then a
    * buckets-sized cumulative window. */
  def qiniCurve(units: DataFrame, idCol: Column, treatedCol: Column,
                outcomeCol: Column, scoreCol: Column,
                buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2)
    val base = units.filter(idCol.isNotNull && treatedCol.isNotNull &&
        scoreCol.isNotNull)
      .select(idCol.as("_id"), when(treatedCol, 1L).otherwise(0L).as("_w"),
        when(outcomeCol, 1L).otherwise(0L).as("_y"),
        scoreCol.cast("long").as("_s"))
    val n = base.agg(count(lit(1)).as("_nn"))
    val rn = row_number().over(Window.orderBy(col("_s").desc, col("_id")))
    val bucketed = base.crossJoin(broadcast(n))
      .withColumn("_rn", rn.cast("long"))
      .withColumn("_b",
        expr(s"(_rn - 1) * $buckets div _nn") + 1)
    val per = bucketed.groupBy(col("_b"))
      .agg(sum(col("_w")).as("_nt"),
        (count(lit(1)) - sum(col("_w"))).as("_nc"),
        sum(col("_w") * col("_y")).as("_rt"),
        sum((lit(1L) - col("_w")) * col("_y")).as("_rc"))
    val cum = Window.orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = per
      .withColumn("cum_n_treated", sum("_nt").over(cum))
      .withColumn("cum_n_control", sum("_nc").over(cum))
      .withColumn("cum_resp_treated", sum("_rt").over(cum))
      .withColumn("cum_resp_control", sum("_rc").over(cum))
    val qini = col("cum_resp_treated").cast("double") -
      col("cum_resp_control").cast("double") *
        (col("cum_n_treated").cast("double") /
          when(col("cum_n_control") > 0,
            col("cum_n_control").cast("double")))
    // + 0.0 canonicalizes IEEE -0.0 (an exactly-cancelling bucket)
    c.select(col("_b").as("bucket"), col("cum_n_treated"),
      col("cum_n_control"), col("cum_resp_treated"),
      col("cum_resp_control"), (round(qini, 6) + lit(0.0)).as("qini"))
  }

  /** Yuen's trimmed two-sample t: Welch on TRIMMED means with
    * WINSORIZED variances — the robust A/B mean test for heavy-tail
    * metrics (revenue!), where [[welchTTest]]'s raw means hand the
    * verdict to a few whales and [[mannWhitneyU]] answers a
    * different question (stochastic dominance, not means). Trim
    * fraction γ per side: g = ⌊γn⌋ extreme ranks drop from the
    * mean; the variance uses values CLAMPED to the surviving range
    * (winsorized). t = (m̄₁−m̄₂)/√(d₁+d₂) with
    * dᵢ = (nᵢ−1)s²wᵢ/(hᵢ(hᵢ−1)), h = n−2g, Satterthwaite df.
    *
    * Exactness: ranks are a per-slice total order on (quantized
    * value, rank window), trim bounds are the exact rank-g+1 and
    * rank-n−g values, clamped sums/squares are exact
    * int64/decimal(38,0), and t/df is ONE fixed double assembly.
    * NULL when either h < 2 or both winsorized variances are 0.
    *
    * Returns one row (n_a, n_b, h_a, h_b, tmean_a, tmean_b, t, df).
    *
    * Scale shape: one slice-partitioned window sort for ranks (two
    * partitions), one conditional agg for the four trim bounds
    * broadcast back, one clamped moment agg. */
  def yuenTTest(df: DataFrame, isSliceA: Column, valueCol: Column,
                trim: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trim > 0 && trim < 0.5)
    val dec = "decimal(38,0)"
    val base = df.filter(isSliceA.isNotNull && valueCol.isNotNull)
      .select(isSliceA.as("_a"), valueCol.cast("long").as("_s"))
    val w = Window.partitionBy("_a").orderBy(col("_s"))
    val ranked = base
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1))
        .over(Window.partitionBy("_a")))
      .withColumn("_g", floor(lit(trim) * col("_n")).cast("long"))
    val bounds = broadcast(ranked.groupBy(col("_a").as("_ab"))
      .agg(max(when(col("_rn") === col("_g") + 1, col("_s"))).as("_lo"),
        max(when(col("_rn") === col("_n") - col("_g"), col("_s")))
          .as("_hi")))
    val m = ranked.join(bounds, col("_a") === col("_ab"))
      .select(col("_a"), col("_n"), col("_g"),
        greatest(col("_lo"), least(col("_hi"), col("_s"))).as("_wv"),
        when(col("_rn") > col("_g") && col("_rn") <= col("_n") - col("_g"),
          col("_s")).as("_tv"))
      .groupBy(col("_a"))
      .agg(max("_n").as("_nn"), max("_g").as("_gg"),
        sum(col("_tv").cast(dec)).as("_ts"),
        sum(col("_wv").cast(dec)).as("_ws"),
        sum((col("_wv") * col("_wv")).cast(dec)).as("_wq"))
    val one = m.agg(
      max(when(col("_a"), col("_nn"))).as("_na"),
      max(when(!col("_a"), col("_nn"))).as("_nb"),
      max(when(col("_a"), col("_gg"))).as("_ga"),
      max(when(!col("_a"), col("_gg"))).as("_gb"),
      max(when(col("_a"), col("_ts"))).as("_tsa"),
      max(when(!col("_a"), col("_ts"))).as("_tsb"),
      max(when(col("_a"), col("_ws"))).as("_wsa"),
      max(when(!col("_a"), col("_ws"))).as("_wsb"),
      max(when(col("_a"), col("_wq"))).as("_wqa"),
      max(when(!col("_a"), col("_wq"))).as("_wqb"))
    def d(c: String) = col(c).cast("double")
    val (na, nb) = (d("_na"), d("_nb"))
    val ha = na - lit(2.0) * d("_ga")
    val hb = nb - lit(2.0) * d("_gb")
    val ma = d("_tsa") / when(ha > 0, ha)
    val mb = d("_tsb") / when(hb > 0, hb)
    // winsorized sample variance: (nΣw² − (Σw)²) / (n(n−1)),
    // assembled in double arithmetic (Deming's sub-2^53 contract)
    val vwa = (na * d("_wqa") - d("_wsa") * d("_wsa")) /
      when(na * (na - 1) > 0, na * (na - 1))
    val vwb = (nb * d("_wqb") - d("_wsb") * d("_wsb")) /
      when(nb * (nb - 1) > 0, nb * (nb - 1))
    val da = (na - 1) * vwa / when(ha * (ha - 1) > 0, ha * (ha - 1))
    val db = (nb - 1) * vwb / when(hb * (hb - 1) > 0, hb * (hb - 1))
    val t = (ma - mb) / sqrt(when(da + db > 0, da + db))
    val dfY = (da + db) * (da + db) / when(
      da * da / (ha - 1) + db * db / (hb - 1) > 0,
      da * da / (ha - 1) + db * db / (hb - 1))
    val ok = ha >= 2 && hb >= 2 && da + db > 0
    one.select(col("_na").as("n_a"), col("_nb").as("n_b"),
      ha.cast("long").as("h_a"), hb.cast("long").as("h_b"),
      round(when(ha > 0, ma), 6).as("tmean_a"),
      round(when(hb > 0, mb), 6).as("tmean_b"),
      round(when(ok, t), 6).as("t"),
      round(when(ok, dfY), 6).as("df"))
  }

  /** Deming (errors-in-both-variables) regression: the total-least-
    * squares line slope = (S_yy − δS_xx + √((S_yy − δS_xx)² +
    * 4δS_xy²)) / (2S_xy) — the calibration-comparison fit OLS gets
    * WRONG when x is also noisy (OLS attenuates the slope toward 0;
    * method-comparison studies and sensor cross-calibration use
    * Deming for exactly this). δ is the y:x error-variance ratio
    * (1 = orthogonal regression).
    *
    * Exactness: the five raw sums are exact decimal(38,0); each is
    * converted to double (exact while < 2^53 — quantize inputs to
    * UNITS, not cents: at unit scale |y| ≤ 10⁵ allows ~10⁶ rows per
    * 2^53 window on Σy²) and the n²-scaled co-moments, slope,
    * intercept and r assemble in ONE fixed double-arithmetic
    * expression — identical operands ⇒ identical results, with no
    * past-2^53 decimal→double conversion anywhere (those can differ
    * in the last ulp across engines). NULL when n < 2, S_xy = 0 (the
    * closed form degenerates — no linear association to orient), or
    * zero variances.
    *
    * Returns one row (n, slope, intercept, r_xy).
    *
    * Scale shape: ONE map-side-combinable moment agg; no joins. */
  def demingRegression(df: DataFrame, xCol: Column, yCol: Column,
                       delta: Double = 1.0): DataFrame = {
    require(delta > 0)
    val dec = "decimal(38,0)"
    val (x, yy) = (xCol.cast("long"), yCol.cast("long"))
    val m = df.filter(xCol.isNotNull && yCol.isNotNull)
      .agg(count(lit(1)).as("_n"),
        sum(x.cast(dec)).as("_sx"), sum(yy.cast(dec)).as("_sy"),
        sum((x * x).cast(dec)).as("_sxx"),
        sum((yy * yy).cast(dec)).as("_syy"),
        sum((x * yy).cast(dec)).as("_sxy"))
    // convert each RAW sum to double, then assemble in double
    // arithmetic: conversions are exact while every sum < 2^53
    // (callers quantize to units, not cents, for exactly this
    // headroom — scaladoc bound), and double ARITHMETIC on identical
    // operands is identical on any engine, unlike conversions of
    // n²-scaled decimal/HUGEINT products past 2^53.
    def d(c: String) = col(c).cast("double")
    val nd = d("_n")
    val sxx = nd * d("_sxx") - d("_sx") * d("_sx")
    val syy = nd * d("_syy") - d("_sy") * d("_sy")
    val sxy = nd * d("_sxy") - d("_sx") * d("_sy")
    val slope = (syy - lit(delta) * sxx +
      sqrt((syy - lit(delta) * sxx) * (syy - lit(delta) * sxx) +
        lit(4.0 * delta) * sxy * sxy)) /
      (lit(2.0) * when(sxy =!= 0, sxy))
    val intercept = (d("_sy") - slope * d("_sx")) / nd
    val r = sxy / sqrt(when(sxx * syy > 0, sxx * syy))
    val ok = col("_n") >= 2 && sxy =!= 0
    m.select(col("_n").as("n"),
      round(when(ok, slope), 6).as("slope"),
      round(when(ok, intercept), 6).as("intercept"),
      round(when(col("_n") >= 2, r), 6).as("r_xy"))
  }

  /** Partial correlation r_xy·z from the three pairwise Pearson
    * correlations: (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — "does
    * x still track y once z is controlled for", the one-number
    * confounder check (q93's Pearson says price tracks quantity;
    * this says whether it still does at FIXED discount). All three
    * r's ride ONE moment aggregation.
    *
    * Exactness: ten int64/decimal(38,0) moments (n, three sums,
    * three squares, three cross-products) from integer-quantized
    * columns; every r and the partial assemble in fixed double
    * expressions. NULL partial when any variance is 0 or a
    * |r| = 1 control makes the denominator 0.
    *
    * Returns one row (n, r_xy, r_xz, r_yz, partial_r).
    *
    * Scale shape: ONE map-side-combinable agg, no joins. */
  def partialCorrelation(df: DataFrame, xCol: Column, yCol: Column,
                         zCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val (x, yy, z) = (xCol.cast("long"), yCol.cast("long"),
      zCol.cast("long"))
    val m = df.filter(xCol.isNotNull && yCol.isNotNull && zCol.isNotNull)
      .agg(count(lit(1)).as("_n"),
        sum(x.cast(dec)).as("_sx"), sum(yy.cast(dec)).as("_sy"),
        sum(z.cast(dec)).as("_sz"),
        sum((x * x).cast(dec)).as("_sxx"),
        sum((yy * yy).cast(dec)).as("_syy"),
        sum((z * z).cast(dec)).as("_szz"),
        sum((x * yy).cast(dec)).as("_sxy"),
        sum((x * z).cast(dec)).as("_sxz"),
        sum((yy * z).cast(dec)).as("_syz"))
    val n = col("_n").cast(dec)
    def d(c: Column) = c.cast("double")
    def r(sab: String, sa: String, sb: String, saa: String,
          sbb: String): Column = {
      val num = d(n * col(sab) - col(sa) * col(sb))
      val va = d(n * col(saa) - col(sa) * col(sa))
      val vb = d(n * col(sbb) - col(sb) * col(sb))
      num / sqrt(when(va * vb > 0, va * vb))
    }
    val rxy = r("_sxy", "_sx", "_sy", "_sxx", "_syy")
    val rxz = r("_sxz", "_sx", "_sz", "_sxx", "_szz")
    val ryz = r("_syz", "_sy", "_sz", "_syy", "_szz")
    val den = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    val part = (rxy - rxz * ryz) / sqrt(when(den > 0, den))
    m.select(col("_n").as("n"),
      round(rxy, 6).as("r_xy"), round(rxz, 6).as("r_xz"),
      round(ryz, 6).as("r_yz"),
      round(when(col("_n") >= 2, part), 6).as("partial_r"))
  }

  /** Dunn's post-hoc test: pairwise mean-rank comparisons on the
    * POOLED ranking — "WHICH groups differ", the follow-up the
    * Kruskal–Wallis omnibus (q229's machinery) leaves open. For each
    * group pair: z = (R̄ᵢ − R̄ⱼ) / √(σ²·(1/nᵢ + 1/nⱼ)) with the
    * tie-corrected σ² = N(N+1)/12 − Σ(t³−t)/(12(N−1)). Reported as
    * raw z per pair; multiplicity control is the caller's policy
    * knob (Bonferroni divides α by the emitted pair count).
    *
    * Exactness: the q391 doubled-rank trick — pooled average ranks
    * ride as exact integers (2R̄ = 2·cumcount + t + 1 per distinct
    * score), group rank sums and the tie mass are exact
    * int64/decimal(38,0), and z is ONE fixed double assembly per
    * pair. NULL z when N < 2 or a variance of 0 (all values tied).
    *
    * Returns one row per unordered pair (group_a, group_b, n_a,
    * n_b, z).
    *
    * Scale shape: one reduced (score) shuffle for the doubled ranks
    * (global window over DISTINCT scores — value-cardinality-sized,
    * the q391 posture), one (group, score) reduction joined back,
    * then a k-row self-join — k is the group count, not the data. */
  def dunnTest(df: DataFrame, groupCol: String,
               valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_s"))
    val sc = base.groupBy(col("_s")).agg(count(lit(1)).as("_t"))
    val prev = Window.orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val rk = sc.withColumn("_r2",
      lit(2L) * coalesce(sum("_t").over(prev), lit(0L)) + col("_t") + 1)
    val gs = base.groupBy(col("_g"), col("_s"))
      .agg(count(lit(1)).as("_c"))
    val pg = gs.join(rk.select(col("_s"), col("_r2")), Seq("_s"))
      .groupBy(col("_g"))
      .agg(sum("_c").as("_n"),
        sum((col("_c") * col("_r2")).cast(dec)).as("_r2j"))
    val ti = broadcast(sc.agg(
      sum((col("_t") * col("_t") * col("_t") - col("_t")).cast(dec))
        .as("_tm"),
      sum("_t").as("_nn")))
    val a = pg.select(col("_g").as("group_a"), col("_n").as("n_a"),
      col("_r2j").as("_ra"))
    val b = pg.select(col("_g").as("group_b"), col("_n").as("n_b"),
      col("_r2j").as("_rb"))
    val pairs = a.join(b, col("group_a") < col("group_b"))
      .crossJoin(ti)
    val nd = col("_nn").cast("double")
    val sig2 = nd * (nd + 1) / 12 - col("_tm").cast("double") /
      when(lit(12.0) * (nd - 1) > 0, lit(12.0) * (nd - 1))
    val ra = col("_ra").cast("double") / (lit(2L) * col("n_a"))
    val rb = col("_rb").cast("double") / (lit(2L) * col("n_b"))
    val inv = lit(1.0) / col("n_a") + lit(1.0) / col("n_b")
    val z = (ra - rb) / sqrt(when(sig2 * inv > 0, sig2 * inv))
    pairs.select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
      round(when(col("_nn") >= 2, z), 6).as("z"))
  }

  /** Analysis of Means (ANOM) decision chart: each group's mean vs
    * the grand mean with decision limits ±h·s·√((k−1)/(k·nᵢ)) — the
    * "WHICH group deviates" chart (Ott), where ANOVA only says
    * "some group does"; unlike pairwise post-hocs it compares each
    * group to the CENTER, the natural shape for shard/site/variant
    * health boards. `h` defaults to 2.576 (~99% pointwise, the
    * q390 flag convention; exact ANOM h-tables refine it).
    *
    * Exactness: grand/group means and the pooled within-group
    * variance assemble from exact int64/decimal moments in double
    * arithmetic; flags compare fixed expressions. NULL limits when
    * k < 2, nᵢ < 2 anywhere pooled variance needs, or s² = 0.
    *
    * Returns one row per group (group, n, mean, grand_mean, lo, hi,
    * flagged).
    *
    * Scale shape: ONE map-side group-moment agg, a 1-row grand
    * reduction broadcast back over the k-row group relation. */
  def anom(df: DataFrame, groupCol: String, valueCol: Column,
           h: Double = 2.576): DataFrame = {
    require(h > 0)
    val dec = "decimal(38,0)"
    val y = valueCol.cast("long")
    val g = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(y.cast(dec)).as("_s"),
        sum((y * y).cast(dec)).as("_q"))
    val tot = broadcast(g.agg(sum("_n").as("_nn"),
      sum("_s").as("_ss"), count(lit(1)).as("_k"),
      // pooled within-group SS: Σᵢ(nᵢΣy²−(Σy)²)/nᵢ, quantized ×1e6
      sum(floor((col("_n").cast("double") * col("_q").cast("double") -
        col("_s").cast("double") * col("_s").cast("double")) /
        col("_n").cast("double") * 1e6 + lit(0.5)).cast("long")
        .cast(dec)).as("_wq")))
    val j = g.crossJoin(tot)
    val nd = col("_n").cast("double")
    val nnD = col("_nn").cast("double")
    val kd = col("_k").cast("double")
    val mean = col("_s").cast("double") / nd
    val grand = col("_ss").cast("double") / nnD
    val s2 = col("_wq").cast("double") / 1e6 /
      when(nnD - kd > 0, nnD - kd)
    val half = lit(h) * sqrt(when(s2 > 0, s2)) *
      sqrt((kd - 1) / when(kd * nd > 0, kd * nd))
    val ok = col("_k") >= 2 && s2 > 0
    j.select(col(groupCol), col("_n").as("n"),
      round(mean, 6).as("mean"), round(grand, 6).as("grand_mean"),
      round(when(ok, grand - half), 6).as("lo"),
      round(when(ok, grand + half), 6).as("hi"),
      when(ok, mean < grand - half || mean > grand + half)
        .as("flagged"))
  }

  /** Ansari–Bradley scale test: do two samples share a DISPERSION
    * around a common center — pooled ranks folded from both ends
    * (score = min(rank, N+1−rank)), so extreme values score LOW and
    * central values HIGH; a sample concentrated in the middle scores
    * high = tighter scale. The rank-based Levene alternative when
    * even medians can't be trusted. Ties take average ranks; the z
    * uses the classic no-tie moments (documented convention),
    * branching on N's parity.
    *
    * Exactness: doubled ranks make the folded scores exact integers
    * (2·score = min(r2, 2(N+1)−r2)); the slice score sum is exact
    * int64/decimal; one fixed moment assembly per parity branch.
    * NULL when either slice is empty or N < 3.
    *
    * Returns one row (n_a, n_b, ab_stat, z).
    *
    * Scale shape: [[mannWhitneyU]]'s — one reduced (score) shuffle,
    * the distinct-score rank window, one pivoted row. */
  def ansariBradley(df: DataFrame, isSliceA: Column,
                    valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = df.filter(isSliceA.isNotNull && valueCol.isNotNull)
      .select(isSliceA.as("_a"), valueCol.cast("long").as("_s"))
    val sc = base.groupBy(col("_s")).agg(count(lit(1)).as("_t"))
    val prev = Window.orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nTot = broadcast(sc.agg(sum("_t").as("_nn")))
    val rk = sc.crossJoin(nTot).withColumn("_r2",
        lit(2L) * coalesce(sum("_t").over(prev), lit(0L)) +
          col("_t") + 1)
      .withColumn("_sc2",
        least(col("_r2"), lit(2L) * (col("_nn") + 1) - col("_r2")))
    val gs = base.groupBy(col("_a"), col("_s"))
      .agg(count(lit(1)).as("_c"))
    val agg = gs.join(rk.select(col("_s"), col("_sc2"), col("_nn")),
        Seq("_s"))
      .groupBy(col("_a"), col("_nn"))
      .agg(sum("_c").as("_nj"),
        sum((col("_c") * col("_sc2")).cast(dec)).as("_w2"))
      .groupBy(col("_nn"))
      .agg(max(when(col("_a"), col("_nj"))).as("n_a"),
        max(when(!col("_a"), col("_nj"))).as("n_b"),
        max(when(col("_a"), col("_w2"))).as("_w2a"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val nD = col("_nn").cast("double")
    val w = col("_w2a").cast("double") / 2
    val even = col("_nn") % 2 === 0
    val eW = when(even, na * (nD + 2) / 4)
      .otherwise(na * (nD + 1) * (nD + 1) / (lit(4.0) * nD))
    val vW = when(even,
      na * nb * (nD + 2) * (nD - 2) / (lit(48.0) * (nD - 1)))
      .otherwise(na * nb * (nD + 1) * (lit(3.0) + nD * nD) /
        (lit(48.0) * nD * nD))
    val z = (w - eW) / sqrt(when(vW > 0, vW))
    val ok = col("n_a").isNotNull && col("n_b").isNotNull &&
      col("_nn") >= 3
    agg.select(col("n_a"), col("n_b"),
      round(when(ok, w), 6).as("ab_stat"),
      round(when(ok, z), 6).as("z"))
  }

  /** Page's trend test over (block, ORDERED treatment, value) cells:
    * L = Σⱼ j·Rⱼ on within-block ranks — the monotone-alternative
    * power [[friedman]] spends everywhere ("does the response RISE
    * across the ordered levels", not just "differ"). Complete blocks
    * only; ties take average ranks; z uses the classic no-tie
    * moments E[L] = bk(k+1)²/4, Var[L] = bk²(k+1)(k²−1)/144
    * (documented convention — heavy ties inflate |z| slightly).
    * Treatment order = the natural ordering of the treatment column.
    *
    * Exactness: doubled ranks (the [[friedman]] trick) keep L exact
    * in halves; the z is one fixed double assembly. NULL when b = 0
    * or k < 3.
    *
    * Returns one row (k, b, l_stat, z).
    *
    * Scale shape: [[friedman]]'s — block-size window, two ranking
    * windows over k-row groups, k-sized reductions. */
  def pageTrend(cells: DataFrame, blockCol: String, treatCol: String,
                valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = cells.filter(col(blockCol).isNotNull &&
        col(treatCol).isNotNull && valueCol.isNotNull)
      .select(col(blockCol).as("_b"), col(treatCol).as("_t"),
        valueCol.cast("long").as("_v"))
    val k1 = base.agg(countDistinct(col("_t")).as("_k"))
    val complete = base.crossJoin(broadcast(k1))
      .withColumn("_bn", count(lit(1))
        .over(Window.partitionBy(col("_b"))))
      .withColumn("_bt", size(collect_set(col("_t"))
        .over(Window.partitionBy(col("_b")))))
      .filter(col("_bn") === col("_k") && col("_bt") === col("_k"))
    val ranked = complete
      .withColumn("_minr", rank().over(
        Window.partitionBy(col("_b")).orderBy(col("_v"))))
      .withColumn("_tie", count(lit(1)).over(
        Window.partitionBy(col("_b"), col("_v"))))
      .withColumn("_r2", lit(2L) * col("_minr") + col("_tie") - 1)
      .withColumn("_j", dense_rank().over(
        Window.partitionBy(col("_b")).orderBy(col("_t"))))
    val rj = ranked.groupBy(col("_t"))
      .agg(max("_j").as("_jj"), sum("_r2").as("_rj2"))
      .agg(sum((col("_jj") * col("_rj2")).cast(dec)).as("_l2"),
        countDistinct(col("_t")).as("_kk"))
    val bc = ranked.select(col("_b")).distinct()
      .agg(count(lit(1)).as("_bc"))
    val one = rj.crossJoin(broadcast(bc))
    val kd = col("_kk").cast("double")
    val bd = col("_bc").cast("double")
    val lStat = col("_l2").cast("double") / 2
    val eL = bd * kd * (kd + 1) * (kd + 1) / 4
    val vL = bd * kd * kd * (kd + 1) * (kd * kd - 1) / 144
    val z = (lStat - eL) / sqrt(when(vL > 0, vL))
    val ok = col("_bc") >= 1 && col("_kk") >= 3
    one.select(col("_kk").as("k"), col("_bc").as("b"),
      round(when(ok, lStat), 6).as("l_stat"),
      round(when(ok, z), 6).as("z"))
  }

  /** Grubbs' statistic per group: G = max|y−ȳ|/s with the arg-max
    * row identified — "is the single most extreme point an outlier,
    * and WHICH row is it" (the record-level answer beside q131's
    * z-score flags; G's null distribution gives the formal test,
    * this emits the statistic and the suspect). Deterministic
    * arg-max: quantized deviation desc, id asc.
    *
    * Exactness: mean/variance assemble from exact int64/decimal
    * moments in double arithmetic; the deviation ranking uses
    * ⌊|y−ȳ|·10⁶+½⌋. NULL G on zero variance or n < 3.
    *
    * Returns (group, n, outlier_id, outlier_value, g_stat).
    *
    * Scale shape: one moment agg broadcast back, one
    * group-partitioned rank window, rows = groups. */
  def grubbs(df: DataFrame, groupCol: String, idCol: Column,
             valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull &&
        idCol.isNotNull)
      .select(col(groupCol).as("_g"), idCol.as("_id"),
        valueCol.cast("long").as("_v"))
    val m = broadcast(base.groupBy(col("_g").as("_gm"))
      .agg(count(lit(1)).as("_n"), sum(col("_v").cast(dec)).as("_s"),
        sum((col("_v") * col("_v")).cast(dec)).as("_q")))
    val nd = col("_n").cast("double")
    val mean = col("_s").cast("double") / nd
    val varS = (nd * col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double")) /
      when(nd * (nd - 1) > 0, nd * (nd - 1))
    val dev = abs(col("_v").cast("double") - mean)
    val ranked = base.join(m, col("_g") === col("_gm"))
      .withColumn("_dq", floor(dev * 1e6 + lit(0.5)).cast("long"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_g"))
          .orderBy(col("_dq").desc, col("_id"))))
      .filter(col("_rn") === 1)
    val g = dev / sqrt(when(varS > 0, varS))
    ranked.select(col("_g").as(groupCol), col("_n").as("n"),
      col("_id").as("outlier_id"), col("_v").as("outlier_value"),
      round(when(col("_n") >= 3 && varS > 0, g), 6).as("g_stat"))
  }

  /** Cochran's Q test over (block, treatment, binary) cells: do k
    * related binary treatments share one success rate — the
    * dichotomous member of the blocked-design family ([[friedman]]
    * ranks ordinal cells; Cochran's Q is its 0/1 special case, and
    * McNemar its k=2 corner). Complete blocks only (all k
    * treatments, k = global distinct count);
    * Q = (k−1)(kΣⱼCⱼ² − N²) / (kN − ΣᵢRᵢ²), df = k−1.
    *
    * Exactness: column totals Cⱼ, row totals Rᵢ, N and both
    * quadratic sums are exact int64/decimal(38,0); ONE double
    * division at the end. NULL when k < 2, b = 0, or the
    * denominator is 0 (every block all-0 or all-1 — no information).
    *
    * Returns one row (k, b, n_success, q_stat, df).
    *
    * Scale shape: [[friedman]]'s complete-block machinery minus the
    * ranking — one block-size window, then two map-side-combinable
    * aggs (per-treatment, per-block) meeting in a 1-row cross. */
  def cochranQ(cells: DataFrame, blockCol: String, treatCol: String,
               xCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val base = cells.filter(col(blockCol).isNotNull &&
        col(treatCol).isNotNull && xCol.isNotNull)
      .select(col(blockCol).as("_b"), col(treatCol).as("_t"),
        when(xCol, 1L).otherwise(0L).as("_x"))
    val k1 = base.agg(countDistinct(col("_t")).as("_k"))
    val complete = base.crossJoin(broadcast(k1))
      .withColumn("_bn", count(lit(1))
        .over(Window.partitionBy(col("_b"))))
      .withColumn("_bt", size(collect_set(col("_t"))
        .over(Window.partitionBy(col("_b")))))
      .filter(col("_bn") === col("_k") && col("_bt") === col("_k"))
    val cj = complete.groupBy(col("_t")).agg(sum("_x").as("_cj"))
      .agg(sum((col("_cj") * col("_cj")).cast(dec)).as("_cc"),
        sum(col("_cj").cast(dec)).as("_n"))
    val ri = complete.groupBy(col("_b")).agg(sum("_x").as("_ri"))
      .agg(sum((col("_ri") * col("_ri")).cast(dec)).as("_rr"),
        count(lit(1)).as("_bc"))
    val one = cj.crossJoin(broadcast(ri)).crossJoin(broadcast(k1))
    val kd = col("_k").cast("double")
    val nd = col("_n").cast("double")
    val num = (kd - 1) * (kd * col("_cc").cast("double") - nd * nd)
    val den = kd * nd - col("_rr").cast("double")
    val q = num / when(den > 0, den)
    val ok = col("_k") >= 2 && col("_bc") >= 1 && den > 0
    one.select(col("_k").as("k"), col("_bc").as("b"),
      col("_n").cast("long").as("n_success"),
      round(when(ok, q), 6).as("q_stat"),
      (col("_k") - 1).as("df"))
  }

  /** Cronbach's alpha over (case, item, value) cells:
    * α = k/(k−1)·(1 − Σᵢσᵢ²/σ_total²) — internal-consistency
    * reliability: do the k items (feature columns, metric variants,
    * annotator scores) measure ONE underlying quantity, or is the
    * composite total mostly noise? Missing (case, item) cells count
    * as 0 (absence is a measurement here — e.g. zero spend on an
    * event type), so every case spans all k items and no
    * complete-case filtering is needed.
    *
    * Exactness: both variance ratios ride as EXACT integers — with
    * the common n(n−1) factor cancelled, Σᵢ(nΣxᵢ²−(Σxᵢ)²) and
    * nΣt²−(Σt)² are decimal(38,0) expressions over int64 cell sums
    * (per-case totals Σt from one extra grouped agg), so
    * A/B meets in ONE double division; the k/(k−1) factor is exact.
    * NULL when k < 2 or the total variance is 0.
    *
    * Returns one row (k, n_cases, alpha).
    *
    * Scale shape: two map-side-combinable aggs over the reduced
    * cell relation (per-item moments; per-case totals then 1-row
    * moments), two 1-row broadcasts — no window, no join wider than
    * a 1-row cross. */
  def cronbachAlpha(cells: DataFrame, caseCol: String, itemCol: String,
                    valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = cells.filter(col(caseCol).isNotNull &&
        col(itemCol).isNotNull && valueCol.isNotNull)
      .select(col(caseCol).as("_c"), col(itemCol).as("_i"),
        valueCol.cast("long").as("_v"))
    val nk = base.agg(countDistinct(col("_c")).as("_n"),
      countDistinct(col("_i")).as("_k"))
    val items = base.groupBy(col("_i"))
      .agg(sum(col("_v").cast(dec)).as("_sx"),
        sum((col("_v") * col("_v")).cast(dec)).as("_sxx"))
      .crossJoin(broadcast(nk))
      .select((col("_n").cast(dec) * col("_sxx") -
        col("_sx") * col("_sx")).as("_numi"))
      .agg(sum("_numi").as("_a"))
    val totals = base.groupBy(col("_c"))
      .agg(sum("_v").as("_t"))
      .agg(sum(col("_t").cast(dec)).as("_st"),
        sum((col("_t") * col("_t")).cast(dec)).as("_stt"))
    val one = items.crossJoin(broadcast(totals))
      .crossJoin(broadcast(nk))
    val b = col("_n").cast(dec) * col("_stt") - col("_st") * col("_st")
    val kd = col("_k").cast("double")
    val alpha = kd / when(kd - 1 > 0, kd - 1) *
      (lit(1.0) - col("_a").cast("double") /
        when(b > 0, b.cast("double")))
    val ok = col("_k") >= 2 && b > 0
    one.select(col("_k").as("k"), col("_n").as("n_cases"),
      round(when(ok, alpha), 6).as("alpha"))
  }

  /** Friedman test over (block, treatment, value) cells: the
    * non-parametric repeated-measures ANOVA — "do the k treatments
    * differ when every block ranks them internally", the
    * within-block design [[kruskalWallis]]-style pooled ranking
    * can't express (block effects cancel by construction). Blocks
    * missing any treatment are EXCLUDED (classic complete-block
    * requirement, k = the global distinct-treatment count); ties
    * within a block take average ranks; the statistic is the
    * tie-corrected χ²_F = (12/(bk(k+1))·ΣⱼRⱼ² − 3b(k+1)) / C with
    * C = 1 − Σ(t³−t)/(b(k³−k)), df = k−1 (the scipy convention).
    *
    * Exactness: average ranks ride as DOUBLED integers
    * (2r̄ = 2·minrank + t − 1, the q391 trick), treatment rank sums
    * and ΣRⱼ² and the tie mass Σ(t³−t) are exact
    * int64/decimal(38,0), and the χ² is ONE fixed double assembly
    * (ΣRⱼ² enters as Σ(2Rⱼ)²/4). NULL when b = 0, k < 2, or C ≤ 0
    * (all-tied blocks).
    *
    * Returns one row (k, b, chi2, df).
    *
    * Scale shape: cells are an already-reduced (block, treatment)
    * relation; complete-block filtering is one block-keyed count
    * join; ranking is two window functions over the SAME block
    * partition (k rows each); everything after is k-sized then
    * 1-row. No self-join, no cross pair stage. */
  def friedman(cells: DataFrame, blockCol: String, treatCol: String,
               valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = cells.filter(col(blockCol).isNotNull &&
        col(treatCol).isNotNull && valueCol.isNotNull)
      .select(col(blockCol).as("_b"), col(treatCol).as("_t"),
        valueCol.cast("long").as("_v"))
    val k1 = base.agg(countDistinct(col("_t")).as("_k"))
    val complete = base
      .crossJoin(broadcast(k1))
      .withColumn("_bn", count(lit(1))
        .over(Window.partitionBy(col("_b"))))
      .withColumn("_bt", size(collect_set(col("_t"))
        .over(Window.partitionBy(col("_b")))))
      .filter(col("_bn") === col("_k") && col("_bt") === col("_k"))
    val ranked = complete
      .withColumn("_minr", rank().over(
        Window.partitionBy(col("_b")).orderBy(col("_v"))))
      .withColumn("_tie", count(lit(1)).over(
        Window.partitionBy(col("_b"), col("_v"))))
      .withColumn("_r2", lit(2L) * col("_minr") + col("_tie") - 1)
    val tieMass = ranked.groupBy(col("_b"), col("_v"))
      .agg(first(col("_tie")).as("_t3"))
      .agg(coalesce(sum((col("_t3") * col("_t3") * col("_t3") -
        col("_t3")).cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("_tm"),
        (countDistinct(col("_b"))).as("_bc"))
    val rj = ranked.groupBy(col("_t")).agg(sum("_r2").as("_rj2"))
      .agg(sum((col("_rj2") * col("_rj2")).cast("decimal(38,0)"))
        .as("_ss"))
    val one = rj.crossJoin(broadcast(tieMass)).crossJoin(broadcast(k1))
    val kd = col("_k").cast("double")
    val bd = col("_bc").cast("double")
    val ss4 = col("_ss").cast("double") / 4
    // ANSI guards: NULL divisors on degenerate shapes (b=0 or k<2)
    val cDen = bd * (kd * kd * kd - kd)
    val c = lit(1.0) - col("_tm").cast("double") / when(cDen > 0, cDen)
    val sDen = bd * kd * (kd + 1)
    val chi2 = (lit(12.0) / when(sDen > 0, sDen) * ss4 -
      lit(3.0) * bd * (kd + 1)) / when(c > 0, c)
    val ok = col("_bc") >= 1 && col("_k") >= 2 && c > 0
    one.select(col("_k").as("k"), col("_bc").as("b"),
      round(when(ok, chi2), 6).as("chi2"),
      (col("_k") - 1).as("df"))
  }

  /** Jarque–Bera normality test per group: JB = n/6·(g₁² + g₂²/4)
    * from moment-exact skewness g₁ = m₃/m₂^1.5 and excess kurtosis
    * g₂ = m₄/m₂² − 3 — the one-number "is this distribution even
    * approximately Gaussian" gate (χ²₂ under H₀) that decides whether
    * z-score machinery (q131 outliers, q261 CIs) is trustworthy on a
    * column, where eyeballing a histogram sketch isn't a test.
    *
    * Callers pass an integer-quantized value column; the four raw
    * power sums Σy..Σy⁴ accumulate as decimal(38,0)/HUGEINT — exact,
    * order-free (y⁴ is squared AS decimal: cent values past ~55k
    * overflow int64 at the fourth power). Central moments and both
    * shape statistics are ONE fixed double assembly over those exact
    * sums (m₂^1.5 as m₂·√m₂ — IEEE sqrt, never libm pow; the
    * [[Similarity.hubnessAudit]] rule). Past 2⁵³ the decimal→double
    * conversions are correctly rounded on both engines (the q394
    * posture — measured cross-engine agreement, not assumed).
    * Groups with n < 2 or zero variance report NULL.
    *
    * Returns (group, n, skewness, ex_kurtosis, jb_stat).
    *
    * Scale shape: ONE map-side-combinable grouped agg of five exact
    * moments; no window, no join, no second shuffle — the cheapest
    * possible distributed shape. */
  def jarqueBera(df: DataFrame, groupCol: String,
                 valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val y = valueCol.cast("long")
    val y2 = (y * y).cast(dec)
    val m = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(y.cast(dec)).as("_s1"),
        sum(y2).as("_s2"), sum((y * y * y).cast(dec)).as("_s3"),
        sum(y2 * y2).as("_s4"))
    val n = col("_n").cast("double")
    val d = (c: String) => col(c).cast("double")
    val mu = d("_s1") / n
    val m2 = d("_s2") / n - mu * mu
    val m3 = d("_s3") / n - lit(3.0) * mu * (d("_s2") / n) +
      lit(2.0) * mu * mu * mu
    val m4 = d("_s4") / n - lit(4.0) * mu * (d("_s3") / n) +
      lit(6.0) * mu * mu * (d("_s2") / n) - lit(3.0) * mu * mu * mu * mu
    // ANSI guard: NULL divisor on zero-variance groups (CSE can
    // hoist g1/g2 past the when() gate)
    val g1 = m3 / when(m2 =!= 0, m2 * sqrt(m2))
    val g2 = m4 / when(m2 =!= 0, m2 * m2) - lit(3.0)
    val jb = n / 6 * (g1 * g1 + g2 * g2 / 4)
    val ok = col("_n") >= 2 && m2 > 0
    m.select(col(groupCol), col("_n").as("n"),
      round(when(ok, g1), 6).as("skewness"),
      round(when(ok, g2), 6).as("ex_kurtosis"),
      round(when(ok, jb), 6).as("jb_stat"))
  }

  /** Durbin–Watson statistic per group: DW = Σ_{t≥2}(eₜ−eₜ₋₁)² / Σeₜ²
    * over a time-ordered residual series — the classic first-order
    * serial-correlation read on [[olsFitApply]]'s residuals (DW≈2
    * independent, →0 positive, →4 negative autocorrelation). The
    * companion dw_rho = 1 − DW/2 first-order estimate rides along.
    *
    * Exactness: residuals are re-quantized to int64 at `scale`
    * (floor(e·scale+½) — callers pass the round-6 residual column, so
    * both engines floor IDENTICAL doubles), the lag difference and
    * both squared terms are exact int64 (|e·scale| ≤ ~3e9 before d²
    * nears Long.MaxValue — document sf beyond that), and the two sums
    * accumulate as decimal(38,0)/HUGEINT — order-free. One final
    * division of identically-converted doubles. Groups with n < 2 or
    * all-zero residuals report NULL (DW undefined).
    *
    * Returns (group, n, dw, dw_rho).
    *
    * Scale shape: ONE group-partitioned window sort (lag 1), then ONE
    * map-side-combinable grouped agg of three exact moments. No join,
    * no second shuffle; the fit upstream is [[olsFitApply]]'s 1-row
    * broadcast, so the whole diagnostic adds one window sort to the
    * residual scan. */
  def durbinWatson(df: DataFrame, groupCol: String,
                   orderCols: Seq[Column], residCol: Column,
                   scale: Long = 1000000L): DataFrame = {
    require(scale >= 1 && orderCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val dec = "decimal(38,0)"
    val e = floor(residCol.cast("double") * scale + lit(0.5)).cast("long")
    val lagged = df.filter(col(groupCol).isNotNull && residCol.isNotNull)
      .select(col(groupCol), e.as("_e"), (e - lag(e, 1).over(w)).as("_d"))
    val m = lagged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col("_e") * col("_e")).cast(dec)).as("_ss"),
        sum((col("_d") * col("_d")).cast(dec)).as("_sd"))
    val dw = col("_sd").cast("double") /
      when(col("_ss") =!= 0, col("_ss").cast("double"))
    val ok = col("n") >= 2 && col("_ss") > 0
    m.select(col(groupCol), col("n"),
      round(when(ok, dw), 6).as("dw"),
      round(when(ok, lit(1.0) - dw / 2), 6).as("dw_rho"))
  }

  /** Stationary distribution of the per-user event-transition Markov
    * chain (power iteration on the row-normalized transition counts):
    * "where does the process SPEND its time", which the raw
    * transition matrix ([[eventTransitions]]) doesn't say. States
    * with no outgoing transitions keep their mass (implicit
    * self-loop) rather than leaking it. `iters` fixed synchronous
    * rounds from the uniform start; probabilities rounded to 8.
    *
    * Exactness: the [[graft.operators.Graph.pageRank]] recipe —
    * every distributed sum is over ×10⁹-quantized int64 edge
    * contributions (floor(v·n/out·Q + ½)), so both engines add the
    * same integers in any order.
    *
    * Scale shape: the state set is BOUNDED (event types), so every
    * iteration is one broadcast join over the transition-count
    * relation and one map-side-combined sum — the transition counts
    * themselves come from one reduced (src, dst) shuffle upstream. */
  def stationaryDist(trans: DataFrame, srcCol: String, dstCol: String,
                     nCol: String, iters: Int = 3,
                     quantScale: Long = 1000000000L): DataFrame = {
    require(iters >= 1)
    val e = trans.select(col(srcCol).as("_src"), col(dstCol).as("_dst"),
      col(nCol).cast("long").as("_n"))
    val states = e.select(col("_src").as("state"))
      .union(e.select(col("_dst"))).distinct()
    val out = e.groupBy("_src").agg(sum("_n").as("_out"))
    val nS = broadcast(states.agg(count(lit(1)).as("_ns")))
    var v = states.crossJoin(nS)
      .select(col("state"), (lit(1.0) / col("_ns")).as("prob"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(broadcast(v.select(col("state").as("_src"), col("prob"))),
          Seq("_src"))
        .join(broadcast(out), Seq("_src"))
        .select(col("_dst").as("state"),
          floor(col("prob") * col("_n") / col("_out") *
            lit(quantScale.toDouble) + lit(0.5)).cast("long").as("_qc"))
        .groupBy("state").agg(sum("_qc").as("_s"))
      val dangling = v
        .join(broadcast(out.select(col("_src").as("state"), col("_out"))),
          Seq("state"), "left")
        .filter(col("_out").isNull)
        .select(col("state"),
          floor(col("prob") * lit(quantScale.toDouble) + lit(0.5))
            .cast("long").as("_d"))
      v = states.join(contrib, Seq("state"), "left")
        .join(dangling, Seq("state"), "left")
        .select(col("state"),
          ((coalesce(col("_s"), lit(0L)) + coalesce(col("_d"), lit(0L)))
            .cast("double") / lit(quantScale.toDouble)).as("prob"))
    }
    v.select(col("state"), round(col("prob"), 8).as("prob"))
  }

  /** Weight-of-evidence categorical encoder, fit/apply split: per
    * category `woe = ln(((pos+0.5)(ntot+0.5)) / ((neg+0.5)(ptot+0.5)))`
    * — the log-odds lift a category gives over the base rate, the
    * classic credit-scoring / feature-screening encoding that (unlike
    * one-hot) stays one column and (unlike [[targetEncodeOOF]]'s
    * out-of-fold means) is monotone in the class ratio with explicit
    * Laplace smoothing, so empty cells encode finite. Categories
    * unseen at fit time apply as `woe = 0` (no evidence). The paired
    * information value `iv = Σ (pos_share − neg_share)·woe` rides
    * every output row — the screening statistic that says whether the
    * column is worth keeping at all.
    *
    * Scale shape: the fit side reduces to one row per category
    * (map-side combined), the two totals fold into that tiny relation
    * driver-free, and the encoder BROADCASTS onto the apply scan —
    * the apply corpus never shuffles. All smoothing terms are spelled
    * with the same literals on the oracle side, so the single `ln` is
    * the only float op and rounds identically. */
  def woeEncode(fit: DataFrame, apply: DataFrame, catCol: String,
                label: Column, idCols: Seq[Column]): DataFrame = {
    val counts = fit.groupBy(col(catCol).as("_cat")).agg(
      sum(when(label, 1L).otherwise(0L)).as("_pos"),
      sum(when(label, 0L).otherwise(1L)).as("_neg"))
    val totals = broadcast(counts.agg(
      sum("_pos").cast("double").as("_ptot"),
      sum("_neg").cast("double").as("_ntot")))
    val woe = log(((col("_pos") + lit(0.5)) * (col("_ntot") + lit(0.5))) /
      ((col("_neg") + lit(0.5)) * (col("_ptot") + lit(0.5))))
    val share = (col("_pos") + lit(0.5)) / (col("_ptot") + lit(0.5)) -
      (col("_neg") + lit(0.5)) / (col("_ntot") + lit(0.5))
    val enc = counts.crossJoin(totals)
      .select(col("_cat"), woe.as("_woe"), (share * woe).as("_ivterm"))
    val iv = broadcast(enc.agg(round(sum("_ivterm"), 6).as("iv")))
    apply.join(broadcast(enc.drop("_ivterm")),
        apply(catCol) === col("_cat"), "left")
      .crossJoin(iv)
      .select(idCols :+ col(catCol) :+
        round(coalesce(col("_woe"), lit(0.0)), 6).as("woe") :+ col("iv"): _*)
  }

  /** Split-conformal prediction interval around [[olsFitApply]]: fit
    * on one fold, take `q̂` = the `⌈covNum·(n+1)/covDen⌉`-th smallest
    * absolute calibration residual, and report test-fold coverage of
    * `pred ± q̂` — the distribution-free guarantee (coverage ≥
    * covNum/covDen for exchangeable data) that turns a point
    * predictor into an honest interval, with NO parametric noise
    * assumption. When the calibration fold is too small for the rank
    * to exist (`k > n_cal`), the honest interval is infinite: q̂ and
    * the coverage columns come back NULL rather than a clamped lie.
    *
    * Exactness: residuals inherit olsFitApply's cent-quantized
    * arithmetic and 6-dp rounding, the rank is pure int64
    * (`(covNum·(n+1) + covDen−1) div covDen`), and q̂ is a VALUE at an
    * integer rank — ties among equal residuals can permute rows, not
    * the selected value.
    *
    * Scale shape: the fit moments and the 1-row (n, k) relation are
    * map-side-combined aggs; the rank selection sorts ONLY the
    * calibration fold's |resid| column (calibration sets are bounded
    * by design in split conformal — at 100 TB you calibrate on a
    * sample, not the corpus); the test fold never shuffles — coverage
    * is a scan-speed comparison against the broadcast q̂. */
  def conformalOls(fit: DataFrame, cal: DataFrame, test: DataFrame,
                   yCol: Column, x1Col: Column, x2Col: Column,
                   covNum: Int = 9, covDen: Int = 10): DataFrame = {
    require(covDen > 0 && covNum > 0 && covNum <= covDen)
    import org.apache.spark.sql.expressions.Window
    val calR = olsFitApply(fit, cal, yCol, x1Col, x2Col, Seq(lit(0L).as("_z")))
      .select(abs(col("resid")).as("_ar"))
    val kRel = calR.agg(count(lit(1)).as("n_cal")).select(col("n_cal"),
      expr(s"(($covNum * (n_cal + 1)) + ${covDen - 1}) div $covDen").as("k"))
    val ranked = calR.withColumn("_rn",
      row_number().over(Window.orderBy("_ar")).cast("long"))
    val qhat = broadcast(kRel.join(ranked, col("_rn") === col("k"), "left")
      .select(col("n_cal"), col("k"), col("_ar").as("qhat")))
    olsFitApply(fit, test, yCol, x1Col, x2Col, Seq(lit(0L).as("_z")))
      .crossJoin(qhat)
      .agg(max("n_cal").as("n_cal"), max("k").as("k"),
        max("qhat").as("qhat"), count(lit(1)).as("n_test"),
        sum(when(col("qhat").isNull, lit(null).cast("long"))
          .when(abs(col("resid")) <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .withColumn("coverage", when(col("n_test") > 0,
        round(col("n_covered").cast("double") / col("n_test"), 6)))
  }

  /** Wald SPRT early-stopping monitor over a Bernoulli conversion
    * stream: per arm, the cumulative log-likelihood ratio
    * `LLR_n = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0))` in event order,
    * the FIRST crossing of the Wald bounds `ln((1−β)/α)` /
    * `ln(β/(1−α))`, and the end-of-stream state — "could we have
    * stopped this test early, and when", the sequential read the
    * fixed-horizon [[abLift]] z-test can't give without peeking
    * penalties. Decisions: `h1` (upper bound crossed), `h0` (lower),
    * `continue` (never crossed; n_decide/llr_decide NULL).
    *
    * Determinism: k and n are exact int64 prefix counts in the
    * caller's total order; the four log constants are plan-time
    * literals whose SQL duals spell the IDENTICAL literal arithmetic
    * (`ln((1 - 0.4) / (1 - 0.2))`, never a simplified constant), so
    * both engines scale the same integers by the same doubles. LLR
    * steps are O(0.1)-sized, so a bound crossing is never decided by
    * a last-ulp libm difference in practice.
    *
    * Scale shape: one cumulative frame window per arm (arms are few;
    * each arm's stream sorts once) and two bounded aggs; at
    * production scale the same statistic folds incrementally in a
    * streaming state store — this is the batch/backtest form. */
  def sprtMonitor(df: DataFrame, armCol: Column, order: Seq[Column],
                  conv: Column, p0: Double, p1: Double,
                  alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0)
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)
    import org.apache.spark.sql.expressions.Window
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1 - p1) / (1 - p0))
    val lnA = math.log((1 - beta) / alpha)
    val lnB = math.log(beta / (1 - alpha))
    val w = Window.partitionBy("_arm").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = df.withColumn("_arm", armCol)
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_k", sum(when(conv, 1L).otherwise(0L)).over(w))
      .withColumn("_llr", col("_k") * lit(c1) + (col("_n") - col("_k")) * lit(c2))
      .withColumn("_dec",
        when(col("_llr") >= lnA, "h1").when(col("_llr") <= lnB, "h0"))
    val tot = cum.groupBy("_arm").agg(max("_n").as("n_total"),
      round(max_by(col("_llr"), col("_n")), 6).as("final_llr"))
    val cross = cum.filter(col("_dec").isNotNull)
      .groupBy("_arm").agg(min("_n").as("n_decide"),
        min_by(col("_dec"), col("_n")).as("_d"),
        round(min_by(col("_llr"), col("_n")), 6).as("llr_decide"))
    tot.join(cross, Seq("_arm"), "left")
      .select(col("_arm").as("arm"), col("n_total"), col("final_llr"),
        col("n_decide"), coalesce(col("_d"), lit("continue")).as("decision"),
        col("llr_decide"))
  }

  /** Capture–recapture population estimate (Chapman's bias-corrected
    * Lincoln–Petersen): from two overlapping observation windows,
    * estimate the TOTAL population including members never seen —
    * `N̂ = (n_a+1)(n_b+1)/(m+1) − 1` — the ecology estimator that
    * answers "how many users/entities exist, not just how many we
    * logged" from nothing but two samples and their overlap. One
    * verdict row: (n_a, n_b, n_both, chapman_est; NULL when either
    * window is empty — no overlap information, no estimate). The
    * independence assumption (capture in A ⫫ capture in B) is the
    * caller's to defend; heterogeneous capture biases N̂ low.
    *
    * Scale shape: two distinct-reduces and one key-equi semi-join,
    * all map-side combinable; the estimate is arithmetic on three
    * integers. */
  def captureRecapture(a: DataFrame, b: DataFrame,
                       keyCol: String): DataFrame = {
    val ka = a.filter(col(keyCol).isNotNull).select(col(keyCol)).distinct()
    val kb = b.filter(col(keyCol).isNotNull).select(col(keyCol)).distinct()
    val m = ka.join(kb, Seq(keyCol), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    ka.agg(count(lit(1)).as("n_a"))
      .crossJoin(kb.agg(count(lit(1)).as("n_b")))
      .crossJoin(m)
      .select(col("n_a"), col("n_b"), col("n_both"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          (col("n_a") + 1).cast("double") * (col("n_b") + 1) /
            (col("n_both") + 1) - 1), 6).as("chapman_est"))
  }

  /** Transition-latency quantiles: for each (src → dst) event-type
    * transition, the exact p50/p90 of the time gap — the read that
    * turns [[eventTransitions]]' "what follows what" into "and HOW
    * LONG it takes", which is where funnels stall and timeouts get
    * their numbers. Quantiles are VALUES at integer ranks (lower
    * median `(n+1) div 2`; p90 `⌈9n/10⌉ = (9n+9) div 10`), ties
    * broken by the caller's id — order-statistic exact, no
    * interpolation to disagree on.
    *
    * Scale shape: one user-ordered lag window builds the gaps (the
    * sessionize shuffle), then one (src,dst)-partitioned rank
    * window; transition pairs are bounded (event-type² at most). */
  def transitionLatency(events: DataFrame, userCol: String,
                        typeCol: String, tsUsCol: Column,
                        idCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(userCol).orderBy(tsUsCol, idCol)
    val gaps = events.filter(col(userCol).isNotNull &&
        col(typeCol).isNotNull && tsUsCol.isNotNull)
      .withColumn("_src", lag(col(typeCol), 1).over(wu))
      .withColumn("_gap", tsUsCol - lag(tsUsCol, 1).over(wu))
      .withColumn("_id", idCol.cast("long"))
      .filter(col("_src").isNotNull)
      .select(col("_src"), col(typeCol).as("_dst"), col("_gap"),
        col("_id"))
    val wr = Window.partitionBy("_src", "_dst")
      .orderBy(col("_gap"), col("_id"))
    val wn = Window.partitionBy("_src", "_dst")
    gaps.withColumn("_rn", row_number().over(wr).cast("long"))
      .withColumn("_n", count(lit(1)).over(wn))
      .groupBy(col("_src").as("src_type"), col("_dst").as("dst_type"))
      .agg(max("_n").as("n"),
        max(when(col("_rn") === expr("(_n + 1) div 2"), col("_gap")))
          .as("p50_us"),
        max(when(col("_rn") === expr("(9 * _n + 9) div 10"), col("_gap")))
          .as("p90_us"))
  }

  /** Wilson score interval per group — the rate CI that behaves at
    * the edges where the Wald interval lies (p̂ = 0 or 1 still gets
    * a non-degenerate interval; tiny n doesn't overshoot [0, 1]):
    * `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)`. One row
    * per group: (group, n, pos, rate, lo, hi). Pairs with
    * [[ebShrinkRates]]: shrinkage moves the point estimate, Wilson
    * states the per-group uncertainty.
    *
    * Exactness: one fixed double expression over exact int counts —
    * the z literal is spelled identically in the oracle dual.
    * Scale shape: one map-side group agg, nothing else. */
  def wilsonInterval(df: DataFrame, groupCol: String, label: Column,
                     z: Double = 1.96): DataFrame = {
    require(z > 0)
    val g = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("pos"))
    val nD = col("n").cast("double")
    val p = col("pos").cast("double") / nD
    val z2 = lit(z * z)
    val center = p + z2 / (lit(2.0) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + z2 / nD
    g.select(col(groupCol), col("n"), col("pos"),
      round(p, 6).as("rate"),
      round((center - half) / denom, 6).as("lo"),
      round((center + half) / denom, 6).as("hi"))
  }

  /** Direct standardization (mix-adjusted rates): re-weight each
    * group's per-stratum rates by the GLOBAL stratum mix — "what
    * would this source's long-doc rate be if it had everyone's
    * language mix", the adjustment that turns q258's Simpson
    * diagnosis into a corrected KPI. Reference weights renormalize
    * over the strata each group actually has (a missing stratum
    * can't contribute a rate; renormalizing keeps the adjusted rate
    * a convex combination instead of silently deflating it).
    * Returns (group, n, raw_rate, adj_rate, mix_effect = raw−adj).
    *
    * Exactness: per-stratum terms `w_s·r_gs` quantize ×10¹² before
    * the cross-strata sums; the final ratio divides two exact int64
    * sums. Scale shape: two map-side aggs ((group, stratum) and
    * stratum margins) + a broadcast of the bounded stratum mix. */
  def mixAdjustedRates(df: DataFrame, groupCol: String,
                       stratumCol: String, label: Column): DataFrame = {
    def q12(c: Column) = floor(c * 1e12 + lit(0.5)).cast("long")
    val base = df.filter(col(groupCol).isNotNull &&
      col(stratumCol).isNotNull)
    val cells = base.groupBy(col(groupCol), col(stratumCol))
      .agg(count(lit(1)).as("_n"),
        sum(when(label, 1L).otherwise(0L)).as("_p"))
    val mix = broadcast(base.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("_sn"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("_tt"))))
      .select(col(stratumCol),
        (col("_sn").cast("double") / col("_tt")).as("_w")))
    cells.join(mix, Seq(stratumCol))
      .groupBy(col(groupCol))
      .agg(sum("_n").as("n"), sum("_p").as("_pos"),
        sum(q12(col("_w") * (col("_p").cast("double") / col("_n"))))
          .as("_wr"),
        sum(q12(col("_w"))).as("_ws"))
      .select(col(groupCol), col("n"),
        round(col("_pos").cast("double") / col("n"), 6).as("raw_rate"),
        round(col("_wr").cast("double") / col("_ws"), 6).as("adj_rate"),
        round(col("_pos").cast("double") / col("n") -
          col("_wr").cast("double") / col("_ws"), 6).as("mix_effect"))
  }

  /** k-fold cross-validated error for [[olsFitApply]]: for each fold
    * f, fit on the other folds and score the held-out slice,
    * reporting per-fold (n_test, mae, rmse) — the generalization
    * read a single fit/apply split can't give (is the model stable,
    * or did one lucky split flatter it). Folds come from the
    * caller's deterministic `foldCol` (hash/modulo), so the CV is
    * reproducible across engines and reruns.
    *
    * Exactness: residuals inherit olsFitApply's cent quantization;
    * |resid|·100 is an exact int64 and resid²·100 quantizes to
    * int64 (cents² are exactly representable doubles first), so the
    * error sums are order-free.
    *
    * Scale shape: k fit aggregations (each one map-side moment pass)
    * + k scan-speed apply projections; nothing quadratic, no fold
    * ever shuffles. */
  def cvOls(df: DataFrame, foldCol: Column, k: Int, yCol: Column,
            x1Col: Column, x2Col: Column): DataFrame = {
    require(k >= 2)
    (0 until k).map { f =>
      olsFitApply(df.filter(foldCol =!= f), df.filter(foldCol === f),
        yCol, x1Col, x2Col, Seq(lit(0L).as("_z")))
        .agg(count(lit(1)).as("n_test"),
          sum(floor(abs(col("resid")) * 100 + lit(0.5)).cast("long"))
            .as("_sa"),
          sum(floor(col("resid") * col("resid") * 100 + lit(0.5))
            .cast("long")).as("_sq"))
        .select(lit(f.toLong).as("fold"), col("n_test"),
          round(col("_sa").cast("double") / 100 / col("n_test"), 6)
            .as("mae"),
          round(sqrt(col("_sq").cast("double") / 100 / col("n_test")), 6)
            .as("rmse"))
    }.reduce(_ unionAll _)
  }

  /** Decile lift / gains table for a score against a binary label —
    * the model-eval classic that [[aucByGroup]]'s single number
    * hides: per score bucket (best first), the positive rate, its
    * lift over the global rate, and the cumulative share of all
    * positives captured — "the top 20% of scores capture X% of
    * conversions". Buckets are exact integer rank arithmetic
    * (`((rn−1)·buckets) div N`), ties broken by id, so bucket
    * membership never floats.
    *
    * Scale shape: one sort of the SCORED EVAL SET (bounded by
    * contract — you rank a scored sample/holdout, not the raw
    * corpus); per-bucket aggs and the cumulative window run on the
    * buckets-sized relation. */
  def liftTable(df: DataFrame, score: Column, label: Column,
                idCol: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 2)
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(score.isNotNull)
      .select(score.as("_s"), when(label, 1L).otherwise(0L).as("_y"),
        idCol.cast("long").as("_id"))
    val n = broadcast(base.agg(count(lit(1)).as("_n"),
      sum("_y").as("_gp")))
    val ranked = base.withColumn("_rn", row_number()
      .over(Window.orderBy(col("_s").desc, col("_id"))).cast("long"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked.crossJoin(n)
      .withColumn("bucket", expr(s"((_rn - 1) * $buckets) div _n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        max("_n").as("_tn"), max("_gp").as("_tp"))
      .withColumn("rate", round(col("n_pos").cast("double") / col("n"), 6))
      .withColumn("lift", round(when(col("_tp") > 0,
        (col("n_pos").cast("double") / col("n")) /
          (col("_tp").cast("double") / col("_tn"))), 6))
      .withColumn("cum_capture", round(when(col("_tp") > 0,
        sum("n_pos").over(wCum).cast("double") / col("_tp")), 6))
      .select("bucket", "n", "n_pos", "rate", "lift", "cum_capture")
  }

  /** Split-balance audit: did a train/val/test split preserve the
    * label mix, or did it silently stratify-break? Per (split,
    * label) cell: observed n, expected under independence, and the
    * χ² contribution; every row carries the total χ² and dof — a
    * large χ² means the split is CORRELATED with the label and any
    * eval on it is biased. (This audits the SPLIT; q194 tests
    * feature association.)
    *
    * Exactness: expected counts are fixed double expressions over
    * exact int64 marginals; the χ² total sums ×10⁶-quantized
    * contributions over the BOUNDED cell relation. Cells with ZERO
    * observed rows do not appear (their contribution — the full
    * expected count — is omitted), so the reported χ² is a lower
    * bound when a split drops a label entirely; an empty cell in a
    * split audit is itself the loudest possible finding.
    *
    * Scale shape: one map-side (split, label) count; marginals and
    * everything after live on cells-many rows. */
  def splitBalanceAudit(df: DataFrame, splitCol: String,
                        labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.filter(col(splitCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(splitCol), col(labelCol))
      .agg(count(lit(1)).as("n"))
    val rowT = Window.partitionBy(splitCol)
    val colT = Window.partitionBy(labelCol)
    val all = Window.partitionBy(lit(1))
    val withE = cells
      .withColumn("_rt", sum("n").over(rowT))
      .withColumn("_ct", sum("n").over(colT))
      .withColumn("_tt", sum("n").over(all))
      .withColumn("expected",
        col("_rt").cast("double") * col("_ct") / col("_tt"))
      .withColumn("_contrib",
        (col("n") - col("expected")) * (col("n") - col("expected")) /
          col("expected"))
    val nS = Window.partitionBy(lit(1))
    val dims = broadcast(cells.agg(
      countDistinct(col(splitCol)).as("_ns"),
      countDistinct(col(labelCol)).as("_nl")))
    withE.crossJoin(dims)
      // decimal(38,0) term sums: a single wildly-imbalanced cell can
      // push (n−E)²/E past 9.2e12, where the ×10⁶ int64 quantization
      // would saturate silently (the emWeights overflow class)
      .withColumn("chi2", round(
        sum(floor(col("_contrib") * 1e6 + lit(0.5)).cast("decimal(38,0)"))
          .over(nS).cast("double") / 1e6, 6))
      .withColumn("dof", (col("_ns") - 1) * (col("_nl") - 1))
      .select(col(splitCol), col(labelCol), col("n"),
        round(col("expected"), 6).as("expected"),
        round(col("_contrib"), 6).as("contrib"), col("chi2"), col("dof"))
  }

  /** Empirical-Bayes (beta-binomial) shrinkage of per-group rates —
    * the batting-average fix for small-n groups: fit a Beta(α, β)
    * prior to the observed group rates by method of moments
    * (`K = α+β = m(1−m)/v − 1`), then shrink each group toward the
    * prior mean: `(pos + α)/(n + K)`. Small groups move a lot, big
    * groups barely — exactly the credibility weighting a raw-rate
    * leaderboard lacks. Degenerate moments (one group, zero
    * variance, or v ≥ m(1−m)) disable shrinkage: α/β NULL, shrunk =
    * raw — never a negative prior.
    *
    * Exactness: group rates are int ratios; the cross-group moment
    * sums are ×10¹²-quantized int64; everything after is a fixed
    * double expression over them.
    *
    * Scale shape: one map-side group agg; moments fold over the
    * BOUNDED group relation; shrinkage is a broadcast of 1 row. */
  def ebShrinkRates(df: DataFrame, groupCol: String,
                    label: Column): DataFrame = {
    def q12(c: Column) = floor(c * 1e12 + lit(0.5)).cast("long")
    val g = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("pos"))
      .withColumn("_raw", col("pos").cast("double") / col("n"))
    val mom = broadcast(g.agg(count(lit(1)).as("_k"),
      sum(q12(col("_raw"))).as("_sm"),
      sum(q12(col("_raw") * col("_raw"))).as("_sq")))
    val m = col("_sm").cast("double") / 1e12 / col("_k")
    val v = (col("_sq").cast("double") / 1e12 - col("_k") * m * m) /
      (col("_k") - 1)
    val bigK = m * (lit(1.0) - m) / v - 1
    g.crossJoin(mom)
      // NOT "_K": Spark resolves columns case-insensitively by
      // default, so a "_K" column would capture the "_k" reference
      // inside the m/v expressions below it
      .withColumn("_bigk",
        when(col("_k") > 1 && v > 0 && bigK > 0, bigK))
      .withColumn("_a", m * col("_bigk"))
      .select(col(groupCol), col("n"), col("pos"),
        round(col("_raw"), 6).as("raw_rate"),
        round(coalesce(
          (col("pos") + col("_a")) / (col("n") + col("_bigk")),
          col("_raw")), 6).as("shrunk_rate"),
        round(col("_a"), 6).as("alpha"),
        round(col("_bigk") - col("_a"), 6).as("beta"))
  }

  /** Segment anomaly scan ("automated insights" lite): for each
    * configured dimension, which segments' label rate deviates from
    * the global rate by at least `zThresh` one-proportion z — the
    * first-pass drilldown that turns "conversion dropped" into
    * "conversion dropped IN THESE SEGMENTS". Segments with a
    * degenerate global rate (p = 0 or 1) report NULL z rather than
    * dividing by zero. Dimensions are plan-time Columns, so derived
    * segmentations (day-of-week, cohort buckets) cost nothing extra.
    *
    * Scale shape: one map-side-combinable agg per dimension over a
    * shared scan + a 1-row global broadcast; output is
    * flagged-segments-sized. (Proper multiple-testing control
    * composes with [[fdrBH]] downstream — this scan RANKS, the BH
    * pass decides.) */
  def segmentScan(df: DataFrame, label: Column,
                  dims: Seq[(String, Column)],
                  zThresh: Double = 2.0): DataFrame = {
    require(dims.nonEmpty && zThresh >= 0)
    val base = df.withColumn("_y", when(label, 1L).otherwise(0L))
    val glob = broadcast(base.agg(sum("_y").as("_gp"),
      count(lit(1)).as("_gn")))
    val p = col("_gp").cast("double") / col("_gn")
    dims.map { case (name, c) =>
      base.groupBy(c.cast("string").as("segment"))
        .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"))
        .select(lit(name).as("dim"), col("segment"), col("n"),
          col("n_pos"))
    }.reduce(_ unionAll _)
      .crossJoin(glob)
      .withColumn("rate", round(col("n_pos").cast("double") / col("n"), 6))
      .withColumn("z", round(when(p > 0 && p < 1,
        (col("n_pos").cast("double") / col("n") - p) /
          sqrt(p * (lit(1.0) - p) / col("n"))), 6))
      .filter(col("z").isNotNull && abs(col("z")) >= zThresh)
      .select("dim", "segment", "n", "n_pos", "rate", "z")
  }

  /** Tukey HSD post-hoc pairwise comparisons — the step AFTER
    * [[anovaF]] says "some group differs": WHICH pairs differ, with
    * the studentized-range correction that keeps the familywise
    * error at α across all k(k−1)/2 comparisons (pairwise t-tests
    * would inflate it). Tukey–Kramer form for unequal n:
    * `q = |mean_a − mean_b| / √(MSE/2 · (1/n_a + 1/n_b))`, flagged
    * against the caller-supplied critical value (q table, k groups ×
    * error df — e.g. 3.858 for k=5, df=∞, α=.05). One row per
    * unordered pair.
    *
    * Exactness: group moments are exact int64/decimal sums; each
    * group's within-SS term quantizes to unit-cents² before the
    * cross-group MSE sum (order-free); pair arithmetic is a fixed
    * double expression.
    *
    * Scale shape: one map-side moment agg; pairs are a self-join of
    * the BOUNDED group relation. */
  def tukeyHsd(df: DataFrame, groupCol: String, valueCol: Column,
               qCrit: Double, scale: Long = 100L): DataFrame = {
    require(qCrit > 0 && scale >= 1)
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val perG = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), q.as("_q"))
      .groupBy("_g")
      .agg(count(lit(1)).as("_n"), sum("_q").as("_s"),
        sum(col("_q").cast("decimal(38,0)") * col("_q")).as("_qq"))
    val gTerm = col("_qq").cast("double") -
      col("_s").cast("double") * col("_s") / col("_n")
    val tot = broadcast(perG.agg(count(lit(1)).as("_k"),
      sum("_n").as("_N"),
      sum(floor(gTerm + lit(0.5)).cast("long")).as("_ssw")))
    val a = perG.select(col("_g").as("group_a"), col("_n").as("n_a"),
      col("_s").as("_sa"))
    val b = perG.select(col("_g").as("group_b"), col("_n").as("n_b"),
      col("_s").as("_sb"))
    val mse = col("_ssw").cast("double") / (col("_N") - col("_k"))
    val diffC = abs(col("_sa").cast("double") / col("n_a") -
      col("_sb").cast("double") / col("n_b"))
    val se = sqrt(mse / 2 * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    a.join(b, col("group_a") < col("group_b")).crossJoin(tot)
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        round(diffC / scale, 6).as("mean_diff"),
        round(when(col("_N") > col("_k") && col("_ssw") > 0, diffC / se), 6)
          .as("q_stat"),
        when(col("_N") > col("_k") && col("_ssw") > 0, diffC / se > qCrit)
          .as("significant"))
  }

  /** Off-policy REPLAY evaluation (Li et al.'s unbiased estimator
    * for uniformly-logged bandits, the audit version for arbitrary
    * logs): estimate what a target policy WOULD have earned from
    * logged (action, reward) data by keeping exactly the rows where
    * the logged action equals the policy's choice and averaging
    * their rewards — no simulator, no model. One verdict row per
    * policy: (policy, n_logged, n_matched, match_rate, est_reward —
    * NULL when the policy never matched; a low match_rate warns the
    * estimate rides few effective samples). Rewards fold as
    * cent-quantized int64 sums, so the mean is engine-exact.
    *
    * Scale shape: one map-side-combinable aggregation per policy
    * over the same scan (Catalyst shares it); policies are plan-time
    * Columns over the logged context, so arbitrary deterministic
    * targeting rules cost nothing extra. */
  def replayEvaluate(log: DataFrame, actionCol: Column, rewardCol: Column,
                     policies: Seq[(String, Column)]): DataFrame = {
    require(policies.nonEmpty)
    policies.map { case (name, tgt) =>
      log.agg(count(lit(1)).as("n_logged"),
          sum(when(actionCol === tgt, 1L).otherwise(0L)).as("n_matched"),
          sum(when(actionCol === tgt,
            floor(rewardCol.cast("double") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L)).as("_sc"))
        .select(lit(name).as("policy"), col("n_logged"), col("n_matched"),
          round(col("n_matched").cast("double") / col("n_logged"), 6)
            .as("match_rate"),
          round(when(col("n_matched") > 0,
            (col("_sc").cast("double") / 100) / col("n_matched")), 6)
            .as("est_reward"))
    }.reduce(_ unionAll _)
  }

  /** Rank-biased overlap (truncated at depth k): how much two top-k
    * rankings agree, weighted toward the TOP —
    * `RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d`. The ranking-
    * comparison read Spearman-over-shared-items can't give: it
    * weights depth 1 like depth 50 and ignores items only one list
    * ranked. p ≈ 0.9 concentrates ~86% of the weight in the top 10.
    * Returns one row: (k, n_a, n_b, rbo). Identical lists → the
    * truncated maximum `(1−p)·Σ p^{d−1}` (< 1; the infinite-tail
    * extrapolation is deliberately not added — audit, not estimate).
    *
    * Determinism: overlap counts are exact ints; each term is
    * `pow(p, d−1)·X_d/d`, summed ×10⁹-quantized; the `1−p` factor is
    * forced DOUBLE arithmetic on both engines (DuckDB's bare `1 −
    * 0.9` is exact DECIMAL — one ulp off a double subtraction).
    *
    * Scale shape: both inputs are top-k lists — bounded by contract
    * (the caller's top-k is the expensive distributed part; this is
    * the bounded comparator on top): a k×2k depth cross over tiny
    * relations. */
  def rbo(rankA: DataFrame, rankB: DataFrame, itemCol: String,
          rankCol: String, k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0 && p < 1)
    val a = rankA.filter(col(rankCol) <= k)
      .select(col(itemCol).as("_it"), col(rankCol).cast("long").as("_ra"))
    val b = rankB.filter(col(rankCol) <= k)
      .select(col(itemCol).as("_it"), col(rankCol).cast("long").as("_rb"))
    val counts = broadcast(a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b"))))
    val depths = rankA.sparkSession.range(1, k + 1)
      .select(col("id").as("_d"))
    val terms = a.join(b, Seq("_it"), "full")
      .crossJoin(broadcast(depths))
      .groupBy("_d")
      .agg(sum(when(col("_ra") <= col("_d") && col("_rb") <= col("_d"), 1L)
        .otherwise(0L)).as("_x"))
      .select((pow(lit(p), col("_d") - 1) * col("_x") / col("_d")).as("_t"))
    terms.agg(sum(floor(col("_t") * 1e9 + lit(0.5)).cast("long")).as("_q"))
      .crossJoin(counts)
      .select(lit(k.toLong).as("k"), col("n_a"), col("n_b"),
        round((lit(1.0) - lit(p)) *
          (coalesce(col("_q"), lit(0L)).cast("double") / 1e9), 6).as("rbo"))
  }

  /** Agreement between two labelings of the same rows — the external
    * cluster-validity triple:
    *  - **ARI** (adjusted Rand): pure pair-counting combinatorics,
    *    carried as EXACT decimal(38,0) integers end to end —
    *    ARI = 2·(Σᵢⱼ C(nᵢⱼ,2)·C(n,2) − ΣC(aᵢ,2)·ΣC(bⱼ,2)) /
    *          (C(n,2)·(ΣC(aᵢ,2)+ΣC(bⱼ,2)) − 2·ΣC(aᵢ,2)·ΣC(bⱼ,2)),
    *    the half-integer-free cross-multiplied form; only the final
    *    division is floating point, on identical operands in any
    *    engine. Bounds: n ≤ 2·10⁹ keeps every product under 10³⁸.
    *  - **NMI** = MI/√(Hₐ·H_b) with each ln-term ×10¹²-quantized and
    *    summed as integers (summation-order-free); NULL when either
    *    marginal entropy is 0 (a single-cluster labeling).
    *  - **purity** of A-clusters against B-classes = Σₐ maxᵦ nₐᵦ / n
    *    (exact integers; note it's asymmetric and inflates as |A|
    *    grows — that's why ARI/NMI ride along).
    * One reduced (a, b) count shuffle; everything after runs on the
    * |A|×|B| contingency relation, which broadcasts. NULL labels on
    * either side are excluded. Returns 1 row
    * (n_points, ari, nmi, purity). */
  def clusteringAgreement(df: DataFrame, aCol: Column,
                          bCol: Column): DataFrame = {
    // C(n,2) with the even factor halved FIRST (exact integer
    // shiftright), so the long product stays inside int64 under the
    // documented n ≤ 2·10⁹ bound; widened to decimal only after
    def c2(n: Column) = when(pmod(n, lit(2L)) === 0,
        shiftright(n, 1) * (n - lit(1L)))
      .otherwise(n * shiftright(n - lit(1L), 1)).cast("decimal(38,0)")
    // the contingency relation is the ONE pass over the corpus; it's
    // |A|×|B|-sized, so materialize it eagerly and derive everything
    // else from the checkpoint (five lazy reuses would mean five
    // corpus scans)
    val ct = df.filter(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("_a"), bCol.as("_b"))
      .agg(count(lit(1)).as("_n"))
      .localCheckpoint(true)
    val ra = ct.groupBy("_a").agg(sum(col("_n")).as("_ai"))
    val rb = ct.groupBy("_b").agg(sum(col("_n")).as("_bj"))
    val tot = broadcast(ct.agg(sum(col("_n")).as("_t"),
      sum(c2(col("_n"))).as("_sij")))
    val sa = broadcast(ra.agg(sum(c2(col("_ai"))).as("_sa")))
    val sb = broadcast(rb.agg(sum(c2(col("_bj"))).as("_sb")))
    // ×10¹²-quantized ln terms: MI over cells, marginal entropies
    def q12(c: Column) = floor(c * 1e12 + lit(0.5)).cast("long")
    val mi = ct.join(broadcast(ra), "_a").join(broadcast(rb), "_b")
      .crossJoin(tot)
      .select(q12((col("_n").cast("double") / col("_t")) *
        log((col("_t").cast("double") * col("_n")) /
          (col("_ai").cast("double") * col("_bj")))).as("_m"))
      .agg(sum(col("_m").cast("decimal(38,0)")).as("_mi"))
    def entropy(c: String): Column =
      sum(q12(-(col(c).cast("double") / col("_t")) *
        log(col(c).cast("double") / col("_t"))).cast("decimal(38,0)"))
    val ha = ra.crossJoin(tot).agg(entropy("_ai").as("_ha"))
    val hb = rb.crossJoin(tot).agg(entropy("_bj").as("_hb"))
    val pur = ct.groupBy("_a").agg(max(col("_n")).as("_mx"))
      .agg(sum(col("_mx")).as("_pu"))
    val cn = c2(col("_t"))
    tot.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .crossJoin(broadcast(mi)).crossJoin(broadcast(ha))
      .crossJoin(broadcast(hb)).crossJoin(broadcast(pur))
      .withColumn("_den", cn * (col("_sa") + col("_sb")) -
        lit(2).cast("decimal(38,0)") * col("_sa") * col("_sb"))
      .select(col("_t").as("n_points"),
        // both labelings a single cluster ⇒ denominator 0 ⇒ ARI
        // undefined (NULL), not a 0/0 NaN
        round(when(col("_den") =!= 0,
          (lit(2).cast("decimal(38,0)") *
            (col("_sij") * cn - col("_sa") * col("_sb"))).cast("double") /
            col("_den").cast("double")), 6).as("ari"),
        round(when(col("_ha") > 0 && col("_hb") > 0,
          col("_mi").cast("double") /
            sqrt(col("_ha").cast("double") * col("_hb").cast("double"))),
          6).as("nmi"),
        round(col("_pu").cast("double") / col("_t"), 6).as("purity"))
  }

  /** Nelson–Aalen cumulative hazard per group: H(t) = Σ_{u ≤ t} d_u/n_u
    * over the same at-risk bookkeeping as [[kaplanMeier]], plus the
    * derived survival exp(−H) — the hazard-side read of the same
    * censored data (NA survival ≥ KM survival pointwise; the gap is a
    * discreteness diagnostic). Censored rows leave the risk set
    * without an event, exactly the standard estimator.
    *
    * Determinism: every d_u/n_u term is one division of identical
    * int64 operands, and the running Σ rides ONE ordered window
    * (distinct t per row → a unique accumulation order on any
    * engine) — the same posture as KM's Σln. d = n is fine here
    * (term 1, no ln(0) hazard), so no extinct pin is needed.
    *
    * Scale shape: identical to [[kaplanMeier]] — one (group, t)
    * shuffle with map-side combine, a groups-sized broadcast of
    * totals, two frames over one group-partitioned window sort;
    * output is (group × distinct-t)-sized. */
  def nelsonAalen(df: DataFrame, groupCol: String, durCol: String,
                  observedCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && col(durCol).isNotNull)
      .select(col(groupCol).as("_g"), col(durCol).as("_t"),
        when(observedCol, lit(1L)).otherwise(lit(0L)).as("_d"))
    val c = base.groupBy("_g", "_t")
      .agg(sum("_d").as("_d"), count(lit(1)).as("_c"))
    val tot = c.groupBy("_g").agg(sum("_c").as("_tot"))
    val w = Window.partitionBy("_g").orderBy("_t")
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    val upto = w.rowsBetween(Window.unboundedPreceding, 0)
    c.join(broadcast(tot), Seq("_g"))
      .withColumn("n_risk",
        col("_tot") - coalesce(sum("_c").over(prev), lit(0L)))
      .withColumn("_h",
        sum(col("_d").cast("double") / col("n_risk").cast("double"))
          .over(upto))
      .select(col("_g").as(groupCol), col("_t").as(durCol),
        col("n_risk"), col("_d").as("n_events"),
        round(col("_h"), 6).as("cum_hazard"),
        round(exp(-col("_h")), 6).as("na_survival"))
  }

  /** Classification / annotator-agreement report: per label (union of
    * gold and predicted label spaces) the support, prediction count,
    * true positives, precision, recall and F1, with the overall
    * accuracy, Cohen's kappa and macro-F1 attached to every row — the
    * labeling-QA read-out a training-data pipeline runs whenever two
    * labelings of the same corpus exist (model vs gold, annotator A
    * vs B, old pipeline vs new).
    *
    * Determinism: everything derives from the int64 contingency
    * table. precision/recall are single divisions; F1 is computed
    * from the UNrounded pair (identical operands cross-engine) and
    * defined 0 when tp = 0 (sklearn's zero_division=0 posture);
    * macro-F1 averages ×10¹²-quantized per-class F1s as exact
    * integers with the divisions in a fixed order (Σq / classes /
    * 10¹²). kappa's expected agreement sums gold×pred products as
    * decimal(38,0) — no int64 overflow at any corpus size — and is
    * NULL when chance agreement is 1 (both sides single-label).
    *
    * Scale shape: one reduced (gold, pred) shuffle (the corpus
    * crosses the wire once as map-side-combined counts); everything
    * downstream operates on the ≤ classes² contingency relation and
    * broadcasts. */
  def classificationReport(df: DataFrame, goldCol: Column,
                           predCol: Column): DataFrame = {
    // the contingency relation is the ONE corpus pass (and the one
    // evaluation of a possibly-expensive predCol expression); it's
    // classes²-sized, so materialize it eagerly — six lazy reuses
    // (gold/pred totals, diagonal, accuracy, kappa, macro) would mean
    // six corpus scans at 100 TB. (At sf0.1 the measured cost is
    // flat either way — AQE exchange reuse already deduplicated the
    // scans; the remaining ~1 s is the q350-class tiny-relation
    // join/broadcast machinery floor, not data.)
    val ct = df.filter(goldCol.isNotNull && predCol.isNotNull)
      .select(goldCol.as("_g"), predCol.as("_p"))
      .groupBy("_g", "_p").agg(count(lit(1)).as("_n"))
      .localCheckpoint(true)
    val gt = ct.groupBy(col("_g").as("_lg")).agg(sum("_n").as("_ng"))
    val pt = ct.groupBy(col("_p").as("_lp")).agg(sum("_n").as("_np"))
    val tp = ct.filter(col("_g") === col("_p"))
      .select(col("_g").as("_lt"), col("_n").as("_tp"))
    val perClass = gt.join(pt, col("_lg") === col("_lp"), "full_outer")
      .select(coalesce(col("_lg"), col("_lp")).as("label"),
        coalesce(col("_ng"), lit(0L)).as("n_gold"),
        coalesce(col("_np"), lit(0L)).as("n_pred"))
      .join(tp, col("label") === col("_lt"), "left_outer")
      .withColumn("tp", coalesce(col("_tp"), lit(0L)))
      .withColumn("_prec", when(col("n_pred") > 0,
        col("tp").cast("double") / col("n_pred")))
      .withColumn("_rec", when(col("n_gold") > 0,
        col("tp").cast("double") / col("n_gold")))
      .withColumn("_f1", when(col("tp") === 0, lit(0.0))
        .otherwise(lit(2.0) * col("_prec") * col("_rec") /
          (col("_prec") + col("_rec"))))
      .select(col("label"), col("n_gold"), col("n_pred"), col("tp"),
        col("_prec"), col("_rec"), col("_f1"))
    val tot = broadcast(ct.agg(sum("_n").as("_N"),
      sum(when(col("_g") === col("_p"), col("_n")).otherwise(lit(0L)))
        .as("_agree")))
    val pe = broadcast(gt.join(pt, col("_lg") === col("_lp"))
      .agg(sum((col("_ng") * col("_np")).cast("decimal(38,0)")).as("_gp")))
    val macroF = broadcast(perClass
      .agg(sum(floor(col("_f1") * 1e12 + lit(0.5)).cast("long")).as("_qf"),
        count(lit(1)).as("_k")))
    perClass.crossJoin(tot).crossJoin(pe).crossJoin(macroF)
      .withColumn("_po", col("_agree").cast("double") / col("_N"))
      .withColumn("_pe",
        coalesce(col("_gp").cast("double"), lit(0.0)) /
          col("_N") / col("_N"))
      .select(col("label"), col("n_gold"), col("n_pred"), col("tp"),
        round(col("_prec"), 6).as("precision"),
        round(col("_rec"), 6).as("recall"),
        round(col("_f1"), 6).as("f1"),
        round(col("_po"), 6).as("accuracy"),
        round(when(col("_pe") < 1.0,
          (col("_po") - col("_pe")) / (lit(1.0) - col("_pe"))), 6)
          .as("kappa"),
        round(col("_qf").cast("double") / col("_k") / 1e12, 6)
          .as("macro_f1"))
  }

  /** Cochran–Armitage trend test: is there a LINEAR trend in a
    * binary outcome's rate across ordered integer scores
    * (dose-response, cohort-age, day-of-week)? χ²-type (2×k)
    * ordered-alternative tests are what [[Profiling.chiSquareIndependence]]
    * can't answer: independence χ² spends power on every departure;
    * this spends it all on the monotone one. Emits the χ²(1)
    * statistic and the trend's sign.
    *
    * Exactness: the statistic assembles from five integer sums
    * (N, R, Σsr, Σsn, Σs²n); the scaled score T′ = N·Σsr − R·Σsn and
    * the variance core R(N−R)(N·Σs²n − (Σsn)²) multiply in
    * decimal(38,0) and meet in ONE double division of identical
    * operands. Base sums are int64 — exact while N·max(s)² < 2⁶³
    * (score range is a query constant, so ~10¹⁷ rows at s ≤ 9).
    *
    * Scale shape: one map-side-combined (score) agg over the scan,
    * then a k-row reduction to a single row — [[anovaF]]'s cheapest-
    * possible shape. */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
                      successCol: Column): DataFrame = {
    val base = df.filter(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_s"),
        when(successCol, 1L).otherwise(0L).as("_y"))
    val perS = base.groupBy("_s")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_r"))
    val agg = perS.agg(count(lit(1)).as("k_levels"),
      sum("_n").as("n"), sum("_r").as("successes"),
      sum(col("_s") * col("_r")).as("_sr"),
      sum(col("_s") * col("_n")).as("_sn"),
      sum(col("_s") * col("_s") * col("_n")).as("_ssn"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val tPrime = d(col("n")) * d(col("_sr")) - d(col("successes")) * d(col("_sn"))
    val varCore = d(col("successes")) * d(col("n") - col("successes")) *
      (d(col("n")) * d(col("_ssn")) - d(col("_sn")) * d(col("_sn")))
    agg.select(col("n"), col("successes"), col("k_levels"),
      round(when(varCore > 0,
        tPrime.cast("double") * tPrime.cast("double") *
          col("n").cast("double") / varCore.cast("double")), 6)
        .as("chi2_trend"),
      signum(tPrime.cast("double")).cast("int").as("trend_sign"))
  }

  /** Delete-one-bucket jackknife standard error for a RATIO metric
    * θ = ΣN/ΣD (revenue per event, conversion per session, CTR) —
    * the variance answer for ratios, where per-row variance formulas
    * are simply wrong (the denominator is random too) and
    * [[bootstrapCI]]'s per-row resampling needs row independence
    * that clustered data (users!) violates. Buckets = the natural
    * cluster (user hash): leave each bucket out, recompute θ, and
    * se² = (g−1)/g · Σ(θ₍ᵢ₎ − θ̄)².
    *
    * Determinism: bucket sums are int64; each θ₍ᵢ₎ is one division of
    * identical operands; θ₍ᵢ₎ quantizes ×10¹² and the deviation
    * squares ×10¹² to int64 before their g-term sums (decimal(38,0),
    * order-free), with divisions in a fixed order — exact while a
    * single deviation² stays under ~9·10⁶ (ratio units²), plenty for
    * any per-unit metric; rescale the ratio upstream beyond that. Buckets that hold
    * ALL denominator mass are dropped (θ₍ᵢ₎ undefined); g counts the
    * retained buckets.
    *
    * Scale shape: one map-side-combined bucket agg over the scan;
    * everything downstream is g-row arithmetic with 1-row
    * broadcasts. g is a query constant (folds), not data-sized. */
  def jackknifeRatio(df: DataFrame, bucketCol: Column, numCol: Column,
                     denCol: Column): DataFrame = {
    val perB = df.filter(bucketCol.isNotNull)
      .groupBy(bucketCol.as("_b"))
      .agg(sum(numCol.cast("long")).as("_sn"),
        sum(denCol.cast("long")).as("_sd"))
    val tot = broadcast(perB.agg(sum("_sn").as("_tn"), sum("_sd").as("_td")))
    val loo = perB.crossJoin(tot)
      .filter(col("_td") - col("_sd") > 0)
      .withColumn("_th", (col("_tn") - col("_sn")).cast("double") /
        (col("_td") - col("_sd")).cast("double"))
    val mean = broadcast(loo
      .agg(sum(floor(col("_th") * 1e12 + lit(0.5)).cast("long")
          .cast("decimal(38,0)")).as("_qs"),
        count(lit(1)).as("g"))
      .select(col("g"),
        (col("_qs").cast("double") / col("g") / 1e12).as("_thbar")))
    loo.crossJoin(mean)
      .select(col("g"), col("_tn"), col("_td"),
        floor((col("_th") - col("_thbar")) * (col("_th") - col("_thbar")) *
          1e12 + lit(0.5)).cast("long").cast("decimal(38,0)").as("_q2"))
      .groupBy(col("g"), col("_tn"), col("_td"))
      .agg(sum("_q2").as("_ss"))
      .select(col("g"),
        round(col("_tn").cast("double") / col("_td"), 6).as("ratio"),
        round(sqrt((col("g") - 1).cast("double") / col("g") *
          (col("_ss").cast("double") / 1e12)), 6).as("jk_se"))
  }

  /** Minimum detectable effect / power read-out for a two-variant
    * experiment: given the realized group sizes and the pooled
    * variance, the smallest true mean difference a two-sided
    * α = 0.05 test would detect with 80% power — the "was this test
    * even capable of seeing what we care about" answer that should
    * accompany every non-significant [[abTest]] read. z constants are
    * FIXED 6-decimal literals (1.959964, 0.841621) shared with the
    * dual — no libm inverse-normal.
    *
    * Exactness: per-variant n, Σq int64 and Σq² decimal(38,0) (the
    * [[anovaF]] envelope); the pooled variance, MDE and relative MDE
    * assemble in double from identical operands on any engine.
    *
    * Scale shape: ONE map-side-combined two-group agg to a single
    * row. */
  def mdePower(df: DataFrame, inA: Column, valueCol: Column,
               scale: Long = 100L): DataFrame = {
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val perV = df.filter(valueCol.isNotNull)
      .select(when(inA, "a").otherwise("b").as("_v"), q.as("_q"))
      .groupBy("_v")
      .agg(count(lit(1)).as("_n"), sum("_q").as("_s"),
        sum(col("_q").cast("decimal(38,0)") * col("_q")).as("_qq"))
    val agg = perV.agg(
      sum(when(col("_v") === "a", col("_n"))).as("n_a"),
      sum(when(col("_v") === "b", col("_n"))).as("n_b"),
      sum(when(col("_v") === "a", col("_s"))).as("_sa"),
      sum(when(col("_v") === "b", col("_s"))).as("_sb"),
      sum(when(col("_v") === "a", col("_qq"))).as("_qa"),
      sum(when(col("_v") === "b", col("_qq"))).as("_qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("_sa").cast("double") / na
    val mb = col("_sb").cast("double") / nb
    val ssA = col("_qa").cast("double") - na * ma * ma
    val ssB = col("_qb").cast("double") - nb * mb * mb
    val sPooled = sqrt((ssA + ssB) / (na + nb - 2))
    val mde = lit(1.959964 + 0.841621) * sPooled *
      sqrt(lit(1.0) / na + lit(1.0) / nb)
    val den = lit(scale.toDouble)
    agg.filter(col("n_a") > 1 && col("n_b") > 1)
      .select(col("n_a"), col("n_b"),
        round(ma / den, 6).as("mean_a"),
        round(mb / den, 6).as("mean_b"),
        round(sPooled / den, 6).as("pooled_sd"),
        round(mde / den, 6).as("mde_abs"),
        round(when(ma =!= 0.0, mde / ma), 6).as("mde_rel"))
  }

  /** Poisson overdispersion check per group: the variance-to-mean
    * ratio of integer counts and the dispersion statistic
    * D = Σ(x−x̄)²/x̄ (≈ χ²(n−1) under Poisson), with the normal-
    * approximation flag z = (D−(n−1))/√(2(n−1)) > 1.959964 — the
    * "is a Poisson model even admissible" gate before any count
    * model or Poisson-assuming test ([[bootstrapCI]]'s resampling,
    * rate CIs). VMR ≈ 1 Poisson; ≫ 1 clumped (the usual reality).
    *
    * Exactness: counts are int64, so n, Σx, Σx² (decimal) are exact
    * and every reported number is a closed form on identical
    * operands; z's threshold is the fixed literal. Groups with n ≤ 1
    * or x̄ = 0 are dropped (nothing to test).
    *
    * Scale shape: one map-side-combinable group agg over the
    * (pre-aggregated) count relation — anovaF's cheapest shape. */
  def overdispersion(df: DataFrame, groupCol: String,
                     countCol: Column): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && countCol.isNotNull)
      .select(col(groupCol).as("_g"), countCol.cast("long").as("_x"))
    val agg = base.groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n"), sum("_x").as("_s"),
        sum(col("_x").cast("decimal(38,0)") * col("_x")).as("_q"))
    val nD = col("n").cast("double")
    val mean = col("_s").cast("double") / nD
    val ss = col("_q").cast("double") - col("_s").cast("double") * mean
    val vmr = (ss / (nD - 1)) / mean
    val disp = ss / mean
    agg.filter(col("n") > 1 && col("_s") > 0)
      .select(col(groupCol), col("n"),
        round(mean, 6).as("mean"),
        round(vmr, 6).as("vmr"),
        round(disp, 6).as("dispersion"),
        ((disp - (nD - 1)) / sqrt((nD - 1) * 2) > 1.959964)
          .as("overdispersed"))
  }

  /** Two-proportion comparison with a Newcombe hybrid CI: the
    * conversion-rate A/B read-out — difference of proportions with
    * the score-interval-based confidence bounds (Newcombe's method:
    * d ± the root-sum-square of each side's Wilson half-widths),
    * which stays sane at extreme rates and tiny n where the Wald
    * interval collapses or escapes [−1, 1]. z is the FIXED 6-decimal
    * literal (1.959964) shared with the dual.
    *
    * Determinism: counts are int64; each Wilson bound and the final
    * assembly are closed-form expressions on identical operands in a
    * fixed order (the [[mdePower]] posture).
    *
    * Scale shape: ONE map-side-combinable two-group agg to a single
    * row. */
  def twoProportionCI(df: DataFrame, inA: Column,
                      successCol: Column): DataFrame = {
    val z = 1.959964
    val base = df.select(when(inA, "a").otherwise("b").as("_v"),
      when(successCol, 1L).otherwise(0L).as("_y"))
    val agg = base.groupBy("_v")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_x"))
      .agg(sum(when(col("_v") === "a", col("_n"))).as("n_a"),
        sum(when(col("_v") === "a", col("_x"))).as("x_a"),
        sum(when(col("_v") === "b", col("_n"))).as("n_b"),
        sum(when(col("_v") === "b", col("_x"))).as("x_b"))
    def wilson(x: Column, n: Column): (Column, Column) = {
      val nD = n.cast("double")
      val p = x.cast("double") / nD
      val z2 = lit(z * z)
      val denom = lit(1.0) + z2 / nD
      val center = (p + z2 / (nD * 2)) / denom
      val half = lit(z) *
        sqrt(p * (lit(1.0) - p) / nD + z2 / (nD * 4 * nD)) / denom
      (center - half, center + half)
    }
    val pa = col("x_a").cast("double") / col("n_a")
    val pb = col("x_b").cast("double") / col("n_b")
    val (la, ua) = wilson(col("x_a"), col("n_a"))
    val (lb, ub) = wilson(col("x_b"), col("n_b"))
    val d = pa - pb
    agg.filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round(d, 6).as("diff"),
        round(d - sqrt((pa - la) * (pa - la) + (ub - pb) * (ub - pb)), 6)
          .as("ci_lo"),
        round(d + sqrt((ua - pa) * (ua - pa) + (pb - lb) * (pb - lb)), 6)
          .as("ci_hi"))
  }

  /** McNemar's test for paired binary outcomes: given one row per
    * unit with two boolean measurements (before/after, variant
    * A-saw/B-saw, model-old/model-new correct), the continuity-
    * corrected χ² = (|n01 − n10| − 1)² / (n01 + n10) over the
    * DISCORDANT counts — the paired-data answer [[abTest]]'s
    * independent-samples z gets wrong (concordant pairs carry no
    * information about a marginal shift). NULL in either measurement
    * drops the pair.
    *
    * Determinism: counts are int64; the statistic is one division of
    * identical operands. χ² is NULL when there are no discordant
    * pairs (no evidence either way, not χ² = 0).
    *
    * Scale shape: ONE map-side-combinable aggregation to a single
    * row — the cheapest possible shape. The caller reduces raw events
    * to per-unit flags first (a keyed agg it usually already has). */
  def mcnemar(pairs: DataFrame, firstCol: Column,
              secondCol: Column): DataFrame = {
    val base = pairs.filter(firstCol.isNotNull && secondCol.isNotNull)
      .select(when(firstCol, 1L).otherwise(0L).as("_a"),
        when(secondCol, 1L).otherwise(0L).as("_b"))
    base.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_a") === 0 && col("_b") === 1, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("_a") === 1 && col("_b") === 0, 1L).otherwise(0L))
          .as("n10"))
      .select(col("n_pairs"), col("n01"), col("n10"),
        round(when(col("n01") + col("n10") > 0,
          (abs(col("n01") - col("n10")) - lit(1L)).cast("double") *
            (abs(col("n01") - col("n10")) - lit(1L)) /
            (col("n01") + col("n10"))), 6).as("chi2"))
  }

  /** Brown–Forsythe test for variance homogeneity: one-way ANOVA on
    * z = |x − median_group| — does the metric's SPREAD differ across
    * groups? (Levene's original uses the mean; the median variant is
    * the robust standard.) The F-statistic companion every
    * mean-difference read ([[anovaF]], [[abTest]]) should ship with:
    * unequal variances invalidate the pooled-variance assumption.
    *
    * Exactness: the metric quantizes to int64 (default cents) and the
    * group median is the EXACT lower median (the q254 ceil-rank), so
    * every z is an exact int64 — Σz, Σz² aggregate exactly (Σz² in
    * decimal(38,0)). Unlike [[anovaF]]'s round-6 posture, the k-term
    * reductions here are made ORDER-FREE outright: each group's
    * Σz²/n term is floor-quantized to int64 before summation (z²
    * magnitudes put the FP reduction tail above 10⁻⁶ — measured: the
    * unquantized cross-engine gap was 2·10⁻⁵ on sf0.01). SS columns
    * are in quantized² units (z is already a difference — de-scaling
    * is the caller's cosmetic).
    *
    * Scale shape: one (group, value) window sort for the exact
    * medians (the grouped-percentile cost class, q39/q254), a
    * groups-sized broadcast back, then anovaF's single
    * map-side-combined agg. */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: Column,
                    scale: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = floor(valueCol.cast("double") * scale + lit(0.5)).cast("long")
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), q.as("_q"))
    val r = base
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_g").orderBy("_q")))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("_g")))
    val med = r.groupBy("_g")
      .agg(max(when(col("_rn") === expr("(_n * 50 + 99) div 100"),
        col("_q"))).as("_med"))
    val z = base.join(broadcast(med), Seq("_g"))
      .select(col("_g"), abs(col("_q") - col("_med")).as("_z"))
    val perG = z.groupBy("_g")
      .agg(count(lit(1)).as("_nj"), sum("_z").as("_sj"),
        sum(col("_z").cast("decimal(38,0)") * col("_z")).as("_qj"))
    // per-group Σz²/n quantized to int64 BEFORE the k-term reduction:
    // integer addition is order-free where a double sum is not
    val qsb = floor(col("_sj").cast("double") * col("_sj") / col("_nj") +
      lit(0.5)).cast("long")
    val agg = perG.agg(count(lit(1)).as("k"), sum("_nj").as("n"),
      sum("_sj").as("_s"),
      sum(qsb.cast("decimal(38,0)")).as("_sb"),
      sum("_qj").as("_sq"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("_sb").cast("double") -
      col("_s").cast("double") * col("_s") / nD
    val ssw = col("_sq").cast("double") - col("_sb").cast("double")
    val f = (ssb / (kD - 1)) / (ssw / (nD - kD))
    agg.select(col("k"), col("n"),
      round(ssb, 6).as("ss_between"),
      round(ssw, 6).as("ss_within"),
      round(when(ssw > 0 && col("n") > col("k"), f), 6).as("f"),
      round(when(ssb + ssw > 0, ssb / (ssb + ssw)), 6).as("eta_sq"))
  }

  /** Average precision (the area under the precision–recall curve as
    * the step function over distinct score thresholds) per group:
    * AP = Σ_levels (Δtp/n_pos) · (tp_cum/k_cum), sweeping thresholds
    * from the highest score down — the ranking-quality companion to
    * [[aucByGroup]] that, unlike ROC-AUC, stays informative under
    * extreme class imbalance (the training-data regime: positives are
    * the rare curated class). Tie-robust by construction: a tie block
    * is one threshold level, so the result does not depend on any
    * within-tie order (no arbitrary tiebreak column needed).
    *
    * Determinism: pass an integer-quantized score. tp_cum/k_cum are
    * int64 window sums over distinct levels (unique accumulation
    * order); each level's term is ×10¹²-quantized to int64 and summed
    * as decimal(38,0) — order-free, no overflow — with the final
    * divisions in a fixed order (Σq / n_pos / 10¹²). Groups without a
    * positive are dropped (AP undefined).
    *
    * Scale shape: one (group, score) shuffle with map-side combine,
    * two frames over one group-partitioned window sort on the reduced
    * level relation, then a map-side-combinable group agg. Nothing
    * global. */
  def averagePrecision(df: DataFrame, groupCol: String, scoreCol: Column,
                       positiveCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && scoreCol.isNotNull)
      .select(col(groupCol).as("_g"), scoreCol.cast("long").as("_s"),
        when(positiveCol, lit(1L)).otherwise(lit(0L)).as("_y"))
    val c = base.groupBy("_g", "_s")
      .agg(sum("_y").as("_pos"), count(lit(1)).as("_cnt"))
    val upto = Window.partitionBy("_g").orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    c.withColumn("_tpc", sum("_pos").over(upto))
      .withColumn("_kc", sum("_cnt").over(upto))
      .withColumn("_q", floor(col("_pos").cast("double") *
        (col("_tpc").cast("double") / col("_kc").cast("double")) * 1e12 +
        lit(0.5)).cast("long"))
      .groupBy(col("_g").as(groupCol))
      .agg(sum("_pos").as("n_pos"),
        (sum("_cnt") - sum("_pos")).as("n_neg"),
        sum(col("_q").cast("decimal(38,0)")).as("_qs"))
      .filter(col("n_pos") > 0)
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        round(col("_qs").cast("double") / col("n_pos") / 1e12, 6)
          .as("avg_precision"))
  }

  /** Shared closed-form solve for ŷ = b₀ + b₁x₁ + b₂x₂ by Cramer's
    * rule over exact integer moment sums (the [[olsFitApply]]
    * machinery, factored for reuse): given the 9 moment columns as
    * doubles, returns (det, b0, b1, b2) expressions. */
  private def ols3(n: Column, a: Column, b: Column, c: Column,
                   dd: Column, e: Column, t0: Column, t1: Column,
                   t2: Column): (Column, Column, Column, Column) = {
    val det = n * (c * e - dd * dd) - a * (a * e - dd * b) +
      b * (a * dd - c * b)
    val det0 = t0 * (c * e - dd * dd) - a * (t1 * e - dd * t2) +
      b * (t1 * dd - c * t2)
    val det1 = n * (t1 * e - dd * t2) - t0 * (a * e - dd * b) +
      b * (a * t2 - t1 * b)
    val det2 = n * (c * t2 - t1 * dd) - a * (a * t2 - t1 * b) +
      t0 * (a * dd - c * b)
    (det, when(det =!= 0, det0 / det), when(det =!= 0, det1 / det),
      when(det =!= 0, det2 / det))
  }

  /** Breusch–Pagan heteroskedasticity test, Koenker's studentized LM
    * form, on the two-regressor OLS: fit y ~ 1 + x₁ + x₂, regress
    * the SQUARED residuals on the same design, LM = n·R² of that
    * auxiliary fit — χ²(2) under homoskedasticity. The assumption
    * check behind every OLS read here ([[olsFitApply]],
    * [[olsInfluence]], [[cvOls]]): if the error variance rides the
    * regressors, the usual standard errors are wrong and every CI
    * downstream inherits it.
    *
    * Determinism: inputs quantized to integer units (the
    * [[olsFitApply]] scale contract) so the moment matrix is exact
    * int64; coefficients are a fixed double expression over those
    * sums (identical IEEE everywhere); each squared residual is
    * re-quantized to int64 units² (floor(e²+½)) so the auxiliary
    * moments accumulate exactly (decimal(38,0) where products can
    * pass 2⁶³); the final assembly is one fixed scalar sequence.
    * NULL lm/r2 on a singular design or zero auxiliary variance.
    *
    * Returns one row (n, lm, df, r2_aux).
    *
    * Scale shape: two map-side-combinable full scans (moments, then
    * residual moments with the 1-row coefficient frame broadcast) —
    * no shuffle wider than one row. */
  def breuschPagan(df: DataFrame, yCol: Column, x1Col: Column,
                   x2Col: Column, scale: Long = 100L): DataFrame = {
    require(scale >= 1)
    def q(c: Column) = floor(c.cast("double") * scale + lit(0.5)).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(yCol.isNotNull && x1Col.isNotNull && x2Col.isNotNull)
      .select(q(yCol).as("_y"), q(x1Col).as("_x1"), q(x2Col).as("_x2"))
    val m = base.agg(count(lit(1)).as("_n"), sum("_x1").as("_a"),
      sum("_x2").as("_b"), sum(col("_x1") * col("_x1")).as("_c"),
      sum(col("_x1") * col("_x2")).as("_d"),
      sum(col("_x2") * col("_x2")).as("_e"),
      sum("_y").as("_t0"), sum(col("_x1") * col("_y")).as("_t1"),
      sum(col("_x2") * col("_y")).as("_t2"))
    val d = (c: String) => col(c).cast("double")
    val (_, b0, b1, b2) = ols3(d("_n"), d("_a"), d("_b"), d("_c"),
      d("_d"), d("_e"), d("_t0"), d("_t1"), d("_t2"))
    val coefs = broadcast(m.select(col("_n"), col("_a"), col("_b"),
      col("_c"), col("_d"), col("_e"), b0.as("_b0"), b1.as("_b1"),
      b2.as("_b2")))
    val eRes = col("_y") - (col("_b0") + col("_b1") * col("_x1") +
      col("_b2") * col("_x2"))
    val aux = base.crossJoin(coefs)
      .select(col("_x1"), col("_x2"),
        floor(eRes * eRes + lit(0.5)).cast("long").as("_gq"),
        col("_n"), col("_a"), col("_b"), col("_c"), col("_d"), col("_e"))
      .groupBy("_n", "_a", "_b", "_c", "_d", "_e")
      .agg(sum(dec(col("_gq"))).as("_sg"),
        sum(dec(col("_gq")) * col("_x1")).as("_sg1"),
        sum(dec(col("_gq")) * col("_x2")).as("_sg2"),
        sum(dec(col("_gq")) * col("_gq")).as("_sgg"))
    val (sg, sg1, sg2, sgg) =
      (d("_sg"), d("_sg1"), d("_sg2"), d("_sgg"))
    val (detA, c0, c1, c2) = ols3(d("_n"), d("_a"), d("_b"), d("_c"),
      d("_d"), d("_e"), sg, sg1, sg2)
    val sst = sgg - sg * sg / d("_n")
    val ssm = c0 * sg + c1 * sg1 + c2 * sg2 - sg * sg / d("_n")
    val r2 = when(detA =!= 0 && sst > 0, ssm / sst)
    aux.select(col("_n").as("n"), round(d("_n") * r2, 6).as("lm"),
      lit(2L).as("df"), round(r2, 6).as("r2_aux"))
  }

  /** Chow structural-break test: does ONE two-regressor OLS fit both
    * segments, or does the relationship change at a known break
    * (regime, time cutoff, cohort)? F = ((SSEₚ − SSE_a − SSE_b)/k) /
    * ((SSE_a + SSE_b)/(n_a + n_b − 2k)), k = 3 parameters — the
    * classic pre/post-regime read on [[olsFitApply]]'s model.
    *
    * Per-segment SSE comes straight from the moment sums:
    * SSE = Σy² − b₀Σy − b₁Σx₁y − b₂Σx₂y with b from Cramer's rule —
    * so the WHOLE test is one conditional-aggregate pass (18 integer
    * sums + two Σy², decimal(38,0) where quadratic) and a fixed
    * scalar assembly. NULL F when either segment's design is
    * singular, a segment is empty, or the denominator df ≤ 0.
    *
    * Returns one row (n_a, n_b, sse_pooled, sse_a, sse_b, f_stat).
    *
    * Scale shape: ONE map-side-combinable scan; nothing shuffles
    * wider than a single row. */
  def chowTest(df: DataFrame, isSegmentB: Column, yCol: Column,
               x1Col: Column, x2Col: Column,
               scale: Long = 100L): DataFrame = {
    require(scale >= 1)
    def q(c: Column) = floor(c.cast("double") * scale + lit(0.5)).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(isSegmentB.isNotNull && yCol.isNotNull &&
        x1Col.isNotNull && x2Col.isNotNull)
      .select(isSegmentB.as("_sb"), q(yCol).as("_y"), q(x1Col).as("_x1"),
        q(x2Col).as("_x2"))
    def side(p: Column, tag: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"_n$tag"),
      sum(when(p, col("_x1")).otherwise(0L)).as(s"_a$tag"),
      sum(when(p, col("_x2")).otherwise(0L)).as(s"_b$tag"),
      sum(when(p, col("_x1") * col("_x1")).otherwise(0L)).as(s"_c$tag"),
      sum(when(p, col("_x1") * col("_x2")).otherwise(0L)).as(s"_d$tag"),
      sum(when(p, col("_x2") * col("_x2")).otherwise(0L)).as(s"_e$tag"),
      sum(when(p, col("_y")).otherwise(0L)).as(s"_t0$tag"),
      sum(when(p, col("_x1") * col("_y")).otherwise(0L)).as(s"_t1$tag"),
      sum(when(p, col("_x2") * col("_y")).otherwise(0L)).as(s"_t2$tag"),
      sum(when(p, dec(col("_y")) * col("_y")).otherwise(lit(0).cast("decimal(38,0)")))
        .as(s"_yy$tag"))
    val cols = side(!col("_sb"), "A") ++ side(col("_sb"), "B")
    val m = base.agg(cols.head, cols.tail: _*)
    val d = (c: String) => col(c).cast("double")
    def sse(tag: (String) => String): Column = {
      val (n, a, b) = (d(tag("_n")), d(tag("_a")), d(tag("_b")))
      val (c, dd, e) = (d(tag("_c")), d(tag("_d")), d(tag("_e")))
      val (t0, t1, t2) = (d(tag("_t0")), d(tag("_t1")), d(tag("_t2")))
      val (det, b0, b1, b2) = ols3(n, a, b, c, dd, e, t0, t1, t2)
      when(det =!= 0, d(tag("_yy")) - b0 * t0 - b1 * t1 - b2 * t2)
    }
    // pooled moments are the segment sums — compute once as columns
    val pooled = m.select(col("*"),
      (col("_nA") + col("_nB")).as("_nP"), (col("_aA") + col("_aB")).as("_aP"),
      (col("_bA") + col("_bB")).as("_bP"), (col("_cA") + col("_cB")).as("_cP"),
      (col("_dA") + col("_dB")).as("_dP"), (col("_eA") + col("_eB")).as("_eP"),
      (col("_t0A") + col("_t0B")).as("_t0P"),
      (col("_t1A") + col("_t1B")).as("_t1P"),
      (col("_t2A") + col("_t2B")).as("_t2P"),
      (col("_yyA") + col("_yyB")).as("_yyP"))
    val (sa, sb, sp) = (sse(t => t + "A"), sse(t => t + "B"),
      sse(t => t + "P"))
    val dfDen = d("_nA") + d("_nB") - 6.0
    val f = when(col("_nA") > 0 && col("_nB") > 0 && dfDen > 0 &&
      sa.isNotNull && sb.isNotNull && sp.isNotNull && (sa + sb) > 0,
      ((sp - sa - sb) / 3.0) / ((sa + sb) / dfDen))
    pooled.select(col("_nA").as("n_a"), col("_nB").as("n_b"),
      round(sp / (lit(scale).cast("double") * scale), 6).as("sse_pooled"),
      round(sa / (lit(scale).cast("double") * scale), 6).as("sse_a"),
      round(sb / (lit(scale).cast("double") * scale), 6).as("sse_b"),
      round(f, 6).as("f_stat"))
  }

  /** Variance inflation factors for a three-regressor design: for
    * each xⱼ, regress it on the other two (+ intercept) and report
    * VIFⱼ = 1/(1 − R²ⱼ) — the standard multicollinearity diagnostic
    * (VIF > 5–10 means the design matrix is near-singular and the
    * coefficient reads in [[olsFitApply]]-family fits are unstable).
    *
    * One pass collects the exact integer moment matrix of the three
    * regressors (decimal(38,0) for the quadratic sums); each
    * auxiliary R² is then Cramer's rule over a permutation of the
    * SAME sums — no second scan. NULL r2/vif when the auxiliary
    * design is singular or xⱼ is constant.
    *
    * Returns 3 rows (variable, n, r2_others, vif).
    *
    * Scale shape: one map-side-combinable scan + a 3-row explode. */
  def vif3(df: DataFrame, x1Col: Column, x2Col: Column, x3Col: Column,
           scale: Long = 100L): DataFrame = {
    require(scale >= 1)
    def q(c: Column) = floor(c.cast("double") * scale + lit(0.5)).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(x1Col.isNotNull && x2Col.isNotNull && x3Col.isNotNull)
      .select(q(x1Col).as("_x1"), q(x2Col).as("_x2"), q(x3Col).as("_x3"))
    val m = base.agg(count(lit(1)).as("_n"),
      sum("_x1").as("_s1"), sum("_x2").as("_s2"), sum("_x3").as("_s3"),
      sum(dec(col("_x1")) * col("_x1")).as("_s11"),
      sum(dec(col("_x1")) * col("_x2")).as("_s12"),
      sum(dec(col("_x1")) * col("_x3")).as("_s13"),
      sum(dec(col("_x2")) * col("_x2")).as("_s22"),
      sum(dec(col("_x2")) * col("_x3")).as("_s23"),
      sum(dec(col("_x3")) * col("_x3")).as("_s33"))
    val d = (c: String) => col(c).cast("double")
    // r2 of target j regressed on (p, q): moments by name permutation
    def r2Of(sj: String, sjj: String, sp: String, sq: String,
             spp: String, spq: String, sqq: String, sjp: String,
             sjq: String): Column = {
      val (det, b0, b1, b2) = ols3(d("_n"), d(sp), d(sq), d(spp),
        d(spq), d(sqq), d(sj), d(sjp), d(sjq))
      val sst = d(sjj) - d(sj) * d(sj) / d("_n")
      val sseJ = d(sjj) - b0 * d(sj) - b1 * d(sjp) - b2 * d(sjq)
      when(det =!= 0 && sst > 0, lit(1.0) - sseJ / sst)
    }
    val r1 = r2Of("_s1", "_s11", "_s2", "_s3", "_s22", "_s23", "_s33",
      "_s12", "_s13")
    val r2 = r2Of("_s2", "_s22", "_s1", "_s3", "_s11", "_s13", "_s33",
      "_s12", "_s23")
    val r3 = r2Of("_s3", "_s33", "_s1", "_s2", "_s11", "_s12", "_s22",
      "_s13", "_s23")
    def vifRow(name: String, r2c: Column) = struct(lit(name).as("variable"),
      round(r2c, 6).as("r2_others"),
      round(when(r2c < 1.0, lit(1.0) / (lit(1.0) - r2c)), 6).as("vif"))
    m.select(col("_n").as("n"), explode(array(vifRow("x1", r1),
        vifRow("x2", r2), vifRow("x3", r3))).as("_r"))
      .select(col("_r.variable").as("variable"), col("n"),
        col("_r.r2_others").as("r2_others"), col("_r.vif").as("vif"))
  }

  /** Brunner–Munzel generalized Wilcoxon test: is
    * p = P(X < Y) + ½P(X = Y) equal to ½ — the two-sample rank test
    * that, unlike [[mannWhitneyU]], does NOT assume equal variances
    * under H₀ (the rank analogue of Welch vs Student). Statistic per
    * Brunner & Munzel 2000: with pooled midranks R and within-group
    * midranks r, Sⱼ² = Σᵢ(Rᵢ − rᵢ − R̄ⱼ + (nⱼ+1)/2)²/(nⱼ−1) and
    * W = n_a·n_b·(R̄_b − R̄_a) / (N·√(n_a·S_a² + n_b·S_b²)).
    *
    * Exactness: the doubled-midrank trick ([[mannWhitneyU]]) keeps
    * every rank integer; each deviation is scaled by 2nⱼ to clear
    * its rational parts — Dᵢ = nⱼ(R2ᵢ − r2ᵢ + nⱼ + 1) − ΣR2ⱼ is
    * exact int64 and ΣcᵢDᵢ² accumulates as decimal(38,0), so both
    * variance sums are order-free integers until one final fixed
    * double assembly. NULL W when either side has < 2 rows or the
    * variance is 0 (e.g. disjoint supports).
    *
    * Returns one row (n_a, n_b, p_hat, w).
    *
    * Scale shape: one reduced (score) shuffle to the distinct-value
    * level relation, three cumulative windows over it, a 1-row
    * totals broadcast back onto the LEVEL table (value-cardinality-
    * sized, not row-sized), one final fold. */
  def brunnerMunzel(df: DataFrame, isSliceA: Column,
                    scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(isSliceA.isNotNull && scoreCol.isNotNull)
      .select(isSliceA.as("_a"), scoreCol.cast("long").as("_s"))
    val sc = base.groupBy("_s").agg(
      count(lit(1)).as("_t"),
      sum(when(col("_a"), 1L).otherwise(0L)).as("_ta"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("_tb"))
    val prev = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    val lev = sc.select(col("_s"), col("_ta"), col("_tb"),
      (lit(2L) * coalesce(sum("_t").over(prev), lit(0L)) + col("_t") + 1L)
        .as("_R2"),
      (lit(2L) * coalesce(sum("_ta").over(prev), lit(0L)) + col("_ta") + 1L)
        .as("_r2a"),
      (lit(2L) * coalesce(sum("_tb").over(prev), lit(0L)) + col("_tb") + 1L)
        .as("_r2b"))
    val tot = broadcast(lev.agg(sum("_ta").as("_na"), sum("_tb").as("_nb"),
      sum(col("_ta") * col("_R2")).as("_Ra2"),
      sum(col("_tb") * col("_R2")).as("_Rb2")))
    val dA = col("_na") * (col("_R2") - col("_r2a") + col("_na") + 1L) -
      col("_Ra2")
    val dB = col("_nb") * (col("_R2") - col("_r2b") + col("_nb") + 1L) -
      col("_Rb2")
    val s = lev.crossJoin(tot)
      .agg(max("_na").as("_na"), max("_nb").as("_nb"),
        max("_Ra2").as("_Ra2"), max("_Rb2").as("_Rb2"),
        sum(dec(col("_ta")) * dec(dA) * dec(dA)).as("_qa"),
        sum(dec(col("_tb")) * dec(dB) * dec(dB)).as("_qb"))
    val (na, nb) = (col("_na").cast("double"), col("_nb").cast("double"))
    val n = na + nb
    val mA = col("_Ra2").cast("double") / (lit(2.0) * na)
    val mB = col("_Rb2").cast("double") / (lit(2.0) * nb)
    val vA = col("_qa").cast("double") / (lit(4.0) * na * na * (na - 1.0))
    val vB = col("_qb").cast("double") / (lit(4.0) * nb * nb * (nb - 1.0))
    val sig = na * vA + nb * vB
    s.select(col("_na").as("n_a"), col("_nb").as("n_b"),
      round((mB - (nb + 1.0) / 2.0) / na, 6).as("p_hat"),
      round(when(col("_na") >= 2 && col("_nb") >= 2 && sig > 0,
        na * nb * (mB - mA) / (n * sqrt(sig))), 6).as("w"))
  }

  /** Anderson–Darling normality test per group — the tail-weighted
    * EDF statistic ([[jarqueBera]] reads moments; A–D reads the
    * whole CDF with extra weight in the tails, where training-data
    * value columns actually go wrong):
    * A² = −n − (1/n)Σ(2i−1)[ln Φ(zᵢ) + ln(1−Φ(z_{n+1−i}))] over the
    * per-group standardized order statistics, plus the small-sample
    * A*² = A²(1 + 0.75/n + 2.25/n²) (D'Agostino).
    *
    * Φ is the Zelen–Severo / A&S 26.2.17 rational approximation
    * (|ε| < 7.5·10⁻⁸) — BOTH engines evaluate the identical fixed
    * formula, so the compare pins implementation equality and the
    * approximation error is a documented property, not drift. Φ is
    * clamped to [10⁻³⁰⁰, 1−10⁻¹⁶] so an extreme outlier's underflow
    * can't produce ln(0). The asc-rank and desc-rank weighted log
    * terms are each ×10⁶-quantized to int64 SEPARATELY, then summed
    * as decimal(38,0) — order-free AND tie-safe: within a tied
    * (group, value) block each rank multiset is fixed regardless of
    * which physical row row_number assigns which rank, so the sum of
    * per-part floors is invariant under tie permutation (a joint
    * floor over the paired terms would not be — the asc/desc pairing
    * onto a physical row comes from two independent sorts and is
    * arbitrary). Mean/sd come from exact integer sums.
    *
    * Returns (group, n, a2, a2_star) for groups with n ≥ 8.
    *
    * Scale shape: one group-partitioned window sort (two frames over
    * one sort: asc + desc ranks), one map-side-combinable agg; the
    * per-group moment frame broadcasts back. */
  def andersonDarling(df: DataFrame, groupCol: String,
                      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_v"))
    val mom = base.groupBy("_g").agg(count(lit(1)).as("_n"),
      sum("_v").as("_s"), sum(dec(col("_v")) * col("_v")).as("_q"))
    val nD = col("_n").cast("double")
    val mean = col("_s").cast("double") / nD
    val varS = (col("_q").cast("double") - nD * mean * mean) / (nD - 1.0)
    val z = (col("_v").cast("double") - mean) / sqrt(varS)
    // Zelen–Severo Φ: t = 1/(1+0.2316419|z|), φ(z)·poly(t), mirrored
    val az = abs(z)
    val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = tt * (lit(0.319381530) + tt * (lit(-0.356563782) +
      tt * (lit(1.781477937) + tt * (lit(-1.821255978) +
        tt * lit(1.330274429)))))
    val upper = exp(-az * az / 2.0) / sqrt(lit(2.0) * math.Pi) * poly
    val phi = when(z >= 0, lit(1.0) - upper).otherwise(upper)
    val phiC = greatest(least(phi, lit(1.0) - 1e-16), lit(1e-300))
    val wAsc = Window.partitionBy("_g").orderBy(col("_v").asc)
    val wDesc = Window.partitionBy("_g").orderBy(col("_v").desc)
    val termAsc = (lit(2L) * row_number().over(wAsc) - 1L).cast("double") *
      log(phiC)
    val termDesc = (lit(2L) * row_number().over(wDesc) - 1L).cast("double") *
      log(lit(1.0) - phiC)
    val agg = base.join(broadcast(mom.filter(col("_n") >= 8 && col("_q") * col("_n") >
        dec(col("_s")) * col("_s"))), Seq("_g"))
      .select(col("_g"), col("_n"),
        (floor(termAsc * 1e6 + lit(0.5)).cast("long") +
          floor(termDesc * 1e6 + lit(0.5)).cast("long")).as("_tq"))
      .groupBy("_g", "_n").agg(sum(dec(col("_tq"))).as("_ts"))
    val nA = col("_n").cast("double")
    val a2 = -nA - col("_ts").cast("double") / 1e6 / nA
    agg.select(col("_g").as(groupCol), col("_n").as("n"),
      round(a2, 6).as("a2"),
      round(a2 * (lit(1.0) + lit(0.75) / nA + lit(2.25) / (nA * nA)), 6)
        .as("a2_star"))
  }

  /** pass@k — the unbiased code/eval-suite estimator (Chen et al.
    * 2021, HumanEval): per task with n samples and c correct,
    * pass@k = 1 − C(n−c,k)/C(n,k) = 1 − Π_{i<k}(n−c−i)/(n−i) — the
    * probability at least one of k drawn samples is correct,
    * estimated without the "take exactly k" variance. THE metric of
    * LLM eval pipelines; tasks with n < k drop (the estimator is
    * undefined), tasks with n−c < k are exactly 1.
    *
    * The product is k fixed double factors over exact integer
    * (n, c) in a fixed order — engine-identical; one rounded output.
    *
    * Returns (task, n, c, pass_at_k).
    *
    * Scale shape: one map-side-combinable count per task. Nothing
    * else. */
  def passAtK(df: DataFrame, taskCol: Column, correctCol: Column,
              k: Int = 5): DataFrame = {
    require(k >= 1)
    val agg = df.filter(taskCol.isNotNull && correctCol.isNotNull)
      .groupBy(taskCol.as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(correctCol, 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= k)
    val nD = col("n").cast("double")
    val cD = col("c").cast("double")
    val prod = (0 until k).map(i => (nD - cD - i) / (nD - i))
      .reduce(_ * _)
    agg.select(col("task"), col("n"), col("c"),
      round(when(col("n") - col("c") < k, lit(1.0))
        .otherwise(lit(1.0) - prod), 6).as("pass_at_k"))
  }

  /** Isotonic calibration by the minimax characterization of the
    * PAV fit: bucket scores into `bins` fixed-width bins, then
    * iso(i) = max_{j≤i} min_{l≥i} rate(j..l) over contiguous bin
    * ranges — the exact pool-adjacent-violators solution computed
    * relationally (PAVA's sequential pooling is a loop; the minimax
    * form is three bounded joins — the right shape for an engine).
    * The result is the monotone non-decreasing score→probability
    * map [[equalMassEce]] measures the need for: Platt without the
    * parametric assumption.
    *
    * Exactness: per-range rates ride as floor(pos·10¹²/n) from
    * exact integer prefix sums; max/min on those quantized int64
    * values (ties inherit the quantization — documented, identical
    * on both engines). Empty bins carry no row (they have no
    * samples to calibrate).
    *
    * Returns (bin, n, n_pos, rate, iso_rate) — iso_rate monotone in
    * bin.
    *
    * Scale shape: one reduced shuffle to ≤ `bins` rows, then all
    * joins are bins²/bins³ on the TINY level relation — corpus size
    * never appears after the first agg. */
  def isotonicCalibration(df: DataFrame, scoreCol: Column,
                          labelCol: Column, bins: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2)
    val b = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(least(greatest(floor(scoreCol.cast("double") * bins), lit(0)),
          lit(bins - 1)).cast("long").as("_b"),
        when(labelCol, 1L).otherwise(0L).as("_y"))
      .groupBy("_b")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_p"))
    val w = Window.orderBy("_b")
    val pre = b.select(col("_b"), col("_n"), col("_p"),
      sum("_n").over(w).as("_cn"), sum("_p").over(w).as("_cp"))
    val lo = pre.select(col("_b").as("_j"),
      (col("_cn") - col("_n")).as("_nj"), (col("_cp") - col("_p")).as("_pj"))
    val hi = pre.select(col("_b").as("_l"), col("_cn").as("_nl"),
      col("_cp").as("_pl"))
    // quantized rate of the contiguous range j..l
    val ranges = lo.crossJoin(hi).filter(col("_j") <= col("_l"))
      .select(col("_j"), col("_l"),
        // ×10⁹ keeps the numerator < 2⁵³: the double division is
        // exact-input, floor engine-identical (1e12 would not be)
        floor((col("_pl") - col("_pj")) * lit(1000000000L) /
          (col("_nl") - col("_nj"))).cast("long").as("_r"))
    val iso = b.select(col("_b"))
      .join(ranges, col("_j") <= col("_b") && col("_l") >= col("_b"))
      .groupBy(col("_b"), col("_j")).agg(min("_r").as("_mn"))
      .groupBy("_b").agg(max("_mn").as("_iso"))
    b.join(iso, Seq("_b"))
      .select(col("_b").as("bin"), col("_n").as("n"),
        col("_p").as("n_pos"),
        round(col("_p").cast("double") / col("_n"), 6).as("rate"),
        round(col("_iso").cast("double") / 1e9, 6).as("iso_rate"))
  }

  /** Bradley–Terry strength ratings from pairwise outcomes — the
    * arena-leaderboard model (and the statistically right way to
    * rank from head-to-head win/loss data: raw win RATE confounds
    * opponent strength; BT's p_i are the MLE of
    * P(i beats j) = p_i/(p_i + p_j)). Fit by `rounds` synchronous
    * MM iterations (Hunter 2004): pᵢ ← wᵢ / Σⱼ nᵢⱼ/(pᵢ + pⱼ) —
    * each round a join of the pair-count level relation against the
    * current ratings; fixed rounds is the documented truncation
    * (the [[pageRank]] contract). Zero-win models sink to exactly 0
    * (their MLE). Scores normalize to shares.
    *
    * Determinism: ratings live ×10⁹-quantized on the model level
    * relation; each MM term is one fixed double expression over
    * exact ints, quantized to int64 ×10⁶ BEFORE the per-model sum —
    * order-free, engine-identical.
    *
    * Returns (model, n_matches, n_wins, bt_score, rank).
    *
    * Scale shape: one (pair) reduced shuffle builds the level
    * relation; every iteration joins it against the broadcast
    * models-sized ratings — pairs and models are CARDINALITY-sized
    * (models², models), not match-volume-sized; the match log is
    * scanned exactly once. */
  def bradleyTerry(df: DataFrame, aCol: Column, bCol: Column,
                   aWinsCol: Column, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1)
    val base = df.filter(aCol.isNotNull && bCol.isNotNull &&
        aWinsCol.isNotNull && aCol =!= bCol)
      .select(aCol.as("_a"), bCol.as("_b"),
        when(aWinsCol, 1L).otherwise(0L).as("_w"))
    val und = base.select(col("_a").as("_i"), col("_b").as("_j"))
      .unionAll(base.select(col("_b"), col("_a")))
      .groupBy("_i", "_j").agg(count(lit(1)).as("_nij"))
    val wins = base
      .select(when(col("_w") === 1, col("_a")).otherwise(col("_b"))
        .as("_i"))
      .groupBy("_i").agg(count(lit(1)).as("_wi"))
    val models = und.select("_i").distinct()
      .join(wins, Seq("_i"), "left")
      .select(col("_i"), coalesce(col("_wi"), lit(0L)).as("_wi"))
    var p = models.withColumn("_pq", lit(1000000000L))
    for (_ <- 1 to rounds) {
      val pj = p.select(col("_i").as("_j"), col("_pq").as("_pj"))
      val den = und
        .join(broadcast(p.select(col("_i"), col("_pq"))), Seq("_i"))
        .join(broadcast(pj), Seq("_j"))
        .select(col("_i"),
          // guard pq+pj=0 (two zero-win models sharing a pair): x/0
          // would ride as Infinity into a saturating long cast — the
          // rating is 0 either way (wi=0 forces pq=0), so the term
          // contributes nothing and can be skipped outright
          when(col("_pq") + col("_pj") > 0,
            floor(col("_nij").cast("double") / (col("_pq") + col("_pj")) *
              lit(1e15) + lit(0.5)).cast("long"))
            .otherwise(lit(0L)).as("_t"))
        .groupBy("_i").agg(sum("_t").as("_dq"))
      p = p.drop("_pq").join(den, Seq("_i"), "left")
        .withColumn("_pq",
          when(col("_dq").isNotNull && col("_dq") > 0,
            floor(col("_wi").cast("double") * 1e15 / col("_dq") +
              lit(0.5)).cast("long")).otherwise(lit(0L)))
        .drop("_dq")
    }
    val nm = und.groupBy("_i").agg(sum("_nij").as("n_matches"))
    val tot = p.agg(sum("_pq").as("_tp"))
    val wr = Window.orderBy(col("_pq").desc, col("_i"))
    p.join(nm, Seq("_i")).crossJoin(broadcast(tot))
      .select(col("_i").as("model"), col("n_matches"),
        col("_wi").as("n_wins"),
        round(col("_pq").cast("double") / col("_tp"), 6).as("bt_score"),
        row_number().over(wr).cast("long").as("rank"))
  }
}
