package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series primitives over irregular event streams. */
object TimeSeries {

  /** Gaps-and-islands: merge overlapping or touching intervals per
    * key into maximal disjoint "islands" — coverage spans from
    * validity/outage/session intervals, the interval-set union every
    * scheduling and uptime pipeline needs. An interval starts a new
    * island iff its start exceeds the running maximum end of all
    * earlier intervals (earlier = by start, tiebroken); `[a,b]`
    * touching `[b,c]` merges (closed-interval convention).
    *
    * Returns (key, island_start, island_end, n_merged).
    *
    * Scale shape: ONE shuffle on the key; the island assignment is
    * two window functions over the SAME (partitionBy key,
    * orderBy start+tiebreak) spec — running max-end then a running
    * sum of island-break flags — followed by a map-side-combinable
    * agg on (key, island). No self-join, no interval join: the
    * classic O(n log n) sweep, distributed by key. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, tieBreak: Seq[String],
                     weightCol: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((col(startCol) +: tieBreak.map(col)).map(_.asc): _*)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    df.withColumn("_new_island",
        when(col(startCol) > coalesce(prevMax, col(startCol) - 1),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("_island", sum(col("_new_island")).over(w))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        // weighted n_merged makes merge COMPOSABLE: islands re-merged
        // with more intervals keep their original member counts, so
        // incremental sessionization (merge old islands + new points)
        // equals the one-shot answer — interval union is associative
        weightCol.map(w => sum(col(w))).getOrElse(count(lit(1)))
          .as("n_merged"))
      .drop("_island")
  }

  /** Dyadic-weight EWMA: exponentially weighted moving average with
    * α = 1/2 over each key's last `maxWindow` observations —
    * `ewma_t = Σ_k 2^(n-1-k)·x_{t-k} / (2^n − 1)` (pandas
    * `ewm(alpha=.5, adjust=True)` truncated to the window). The
    * recursive EWMA is order-SEQUENTIAL and so unimplementable as a
    * distributed aggregate without either a sequential scan or FP
    * drift; restricting to dyadic weights on a quantized input makes
    * numerator and denominator EXACT INTEGERS — bit-identical on any
    * engine and partitioning — while keeping 1/2^15 ≈ 0.003% of the
    * tail weight, far below any real smoothing use-case's noise.
    *
    * `xqCol` must be an integer-quantized series (e.g.
    * `floor(x·1e6+½)`); `unscale` divides back. Requires
    * `|xq| · 2^maxWindow < 2^52` — at maxWindow = 16 that allows
    * |x| up to ~10⁶ at µ-precision.
    *
    * Scale shape: one key shuffle + one ordered window pass; the
    * fold over the ≤maxWindow-element frame list is per-row constant
    * work inside codegen HOFs — no UDF, no sequential dependency
    * across partitions. */
  def ewmaDyadic(df: DataFrame, keyCol: String, order: Seq[Column],
                 xqCol: String, maxWindow: Int,
                 unscale: Double): DataFrame = {
    require(maxWindow >= 1 && maxWindow <= 32)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-(maxWindow - 1), 0)
    df.withColumn("_xs", collect_list(col(xqCol)).over(w))
      .withColumn("_num", expr(
        "aggregate(_xs, named_struct('s', 0L, 'w', 1L), " +
        "(acc, x) -> named_struct('s', acc.s + x * acc.w, 'w', acc.w * 2L), " +
        "acc -> acc.s)"))
      .withColumn("_den", expr("shiftleft(1L, size(_xs)) - 1"))
      .withColumn("ewma",
        round(col("_num").cast("double") / col("_den") / lit(unscale), 6))
      .drop("_xs", "_num", "_den")
  }

  /** Epoch-aligned resampling with forward fill: for each key, one
    * row per `stepUs` grid instant between the key's first and last
    * observation, carrying the payload of the latest observation AT
    * OR BEFORE the instant (ties broken by `tiebreak`, greatest
    * wins). The pandas `resample().ffill()` / SQL `ASOF JOIN` against
    * a generated calendar — gap filling for irregular feeds. Grid
    * instants are epoch-aligned (`p · stepUs`), so grids from
    * different runs or partitions line up by construction. Returns
    * the key, `grid_us`, and the payload columns; every grid row has
    * a match because the grid starts at the first observation.
    *
    * Scale shape: one map-side-combinable min/max agg per key, an
    * output-sized `sequence` explode (rows = grid instants, never
    * observations × instants), and [[AsOfJoin.asOfUnion]]'s single
    * union+window pass — one shuffle on the key, output linear in
    * grid + observations. The naive per-instant range join
    * (instants × candidate observations) never materializes. Dense
    * keys (years of span) fan out proportionally to their own grid —
    * pick `stepUs` for the product you need, not per-key row counts. */
  /** Calendar spine: one row per day in [start, end] with the
    * standard derived attributes (dow 0=Sunday, month, quarter,
    * is_weekend, ISO week) — the generated dimension every
    * time-grain report joins against, so day gaps in fact data
    * become visible NULLs instead of silently missing rows.
    *
    * Scale shape: generated from a single `sequence` literal —
    * days-sized, no input scan; always broadcastable. */
  /** Time-decayed counts per key: each event contributes
    * `2^-min(age, maxAge)` where age = (newest day in the data − the
    * event's day) — the "trending now" score that lets yesterday's
    * burst outrank last month's steady drip. Returns (key,
    * decayed rounded 6, n raw count).
    *
    * BIT-EXACT across engines and partition orders (the [[ewmaDyadic]]
    * trade): every weight is a dyadic rational with quantum
    * `2^-maxAge`, exactly representable in a double, and partial sums
    * stay exact while total score < 2^(53−maxAge) — ~8.4M weighted
    * rows per key at the default maxAge 30 — so the FP `sum` is
    * order-free and a hash-compare against another engine holds. The
    * age cap costs nothing semantically: a 30-day-old event's true
    * weight is below 1e-9 anyway.
    *
    * Scale shape: one 1-row broadcast for the global max day (a
    * documented statistics pass, like the skew profile q86), then one
    * map-side-combinable groupBy — scan-shaped, no sort, no window. */
  def decayedCounts(df: DataFrame, keyCol: String, dayCol: Column,
                    maxAge: Int = 30): DataFrame = {
    val base = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("_k"), dayCol.cast("long").as("_day"))
    val mx = base.agg(max("_day").as("_md"))
    base.crossJoin(broadcast(mx))
      .select(col("_k"),
        pow(lit(0.5), least(col("_md") - col("_day"), lit(maxAge.toLong))
          .cast("double")).as("_w"))
      .groupBy(col("_k").as(keyCol))
      .agg(round(sum("_w"), 6).as("decayed"), count(lit(1)).as("n"))
  }

  def dateSpine(spark: org.apache.spark.sql.SparkSession,
                start: String, end: String): DataFrame = {
    spark.range(1)
      .select(explode(sequence(to_date(lit(start)), to_date(lit(end)),
        expr("interval 1 day"))).as("_d"))
      .select(date_format(col("_d"), "yyyy-MM-dd").as("day"),
        (dayofweek(col("_d")) - 1).as("dow"),
        month(col("_d")).as("month"), quarter(col("_d")).as("quarter"),
        (dayofweek(col("_d")) === 1 || dayofweek(col("_d")) === 7)
          .as("is_weekend"),
        weekofyear(col("_d")).as("week"))
  }

  /** Lag-N autocorrelation per group: Pearson correlation between the
    * series and its own N-step-lagged self, over `orderCols` (pass a
    * unique tiebreak). Near zero for white noise, positive for
    * trending/sticky series, negative for mean-reverting — the
    * seasonality/stickiness probe that pairs with
    * [[graft.operators.Outliers.cusumDrift]]. TWO-PASS centered sums
    * (q93's cancellation lesson). Returns (group, acf, n).
    *
    * Scale shape: one group-partitioned window (lag), then the same
    * broadcast-means + centered-products pass as grouped correlation
    * — two corpus scans, shuffles only on the group key. */
  def autocorrelation(df: DataFrame, groupCol: String,
                      orderCols: Seq[org.apache.spark.sql.Column],
                      valueCol: String, lagN: Int = 1): DataFrame = {
    require(lagN >= 1 && orderCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val pairs = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as("_y"),
        lag(col(valueCol), lagN).over(w).as("_x"))
      .filter(col("_x").isNotNull)
    val means = broadcast(pairs.groupBy(col(groupCol))
      .agg(avg("_x").as("_mx"), avg("_y").as("_my")))
    val dx = col("_x") - col("_mx")
    val dy = col("_y") - col("_my")
    pairs.join(means, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(round(sum(dx * dy) / sqrt(sum(dx * dx) * sum(dy * dy)), 5)
          .as("acf"),
        count(lit(1)).as("n"))
  }

  /** Heartbeat availability per stream: treat each key's events as
    * liveness signals; any inter-event gap beyond `thresholdNs`
    * counts its excess as downtime, and availability = 1 −
    * downtime/span over the key's observed window — the SLA read-out
    * (sensor fleets, service heartbeats, device telemetry) that
    * [[graft.operators.Merge]]-style interval algebra doesn't give
    * directly. Also reports the outage count and the longest gap.
    *
    * Determinism: everything is int64 nanosecond arithmetic until
    * the one availability division of identical operands. Keys with
    * a single event (span 0) report NULL availability — one
    * heartbeat proves nothing.
    *
    * Scale shape: one key-partitioned window sort (the sessionizer's
    * cost class — per-key event counts bound each partition), then a
    * map-side-combinable per-key agg. */
  def heartbeatAvailability(df: DataFrame, groupCol: String,
                            tsCol: Column,
                            thresholdNs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholdNs > 0)
    val w = Window.partitionBy("_g").orderBy("_t")
    val gaps = df.filter(col(groupCol).isNotNull && tsCol.isNotNull)
      .select(col(groupCol).as("_g"), tsCol.cast("long").as("_t"))
      .withColumn("_gap", col("_t") - lag("_t", 1).over(w))
    gaps.groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n_events"),
        (max("_t") - min("_t")).as("span_ns"),
        sum(when(col("_gap") > thresholdNs, col("_gap") - thresholdNs)
          .otherwise(0L)).as("downtime_ns"),
        sum(when(col("_gap") > thresholdNs, 1L).otherwise(0L))
          .as("n_outages"),
        max("_gap").as("max_gap_ns"))
      .select(col(groupCol), col("n_events"), col("span_ns"),
        col("downtime_ns"), col("n_outages"), col("max_gap_ns"),
        round(when(col("span_ns") > 0,
          lit(1.0) - col("downtime_ns").cast("double") / col("span_ns")),
          6).as("availability"))
  }

  /** Multi-lag ACF table per group: [[autocorrelation]] at lags
    * 1..maxLag from ONE window sort — the L lagged columns ride the
    * same ordering, melt to (group, lag) pairs, and the two-pass
    * centered correlation runs per (group, lag). The correlogram
    * read (seasonality shows as a spike at its period; MA signatures
    * as a cut-off) that single-lag ACF can't give.
    *
    * Scale shape: one group-partitioned window sort producing L
    * columns (no extra shuffle per lag), one ≤L-way melt of the
    * already-reduced pair relation, then the broadcast-means +
    * centered-products pass keyed by (group, lag). L is a query
    * constant. */
  def acfTable(df: DataFrame, groupCol: String,
               orderCols: Seq[org.apache.spark.sql.Column],
               valueCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && orderCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val lagged = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(Seq(col(groupCol), col(valueCol).cast("double").as("_y")) ++
        (1 to maxLag).map(l =>
          lag(col(valueCol), l).over(w).cast("double").as(s"_x$l")): _*)
    val pairs = lagged.select(col(groupCol), col("_y"),
        explode(array((1 to maxLag).map(l =>
          struct(lit(l).as("lag"), col(s"_x$l").as("x"))): _*)).as("e"))
      .select(col(groupCol), col("e.lag").as("lag"),
        col("e.x").as("_x"), col("_y"))
      .filter(col("_x").isNotNull)
    val means = broadcast(pairs.groupBy(col(groupCol), col("lag"))
      .agg(avg("_x").as("_mx"), avg("_y").as("_my")))
    val dx = col("_x") - col("_mx")
    val dy = col("_y") - col("_my")
    pairs.join(means, Seq(groupCol, "lag"))
      .groupBy(col(groupCol), col("lag"))
      .agg(round(sum(dx * dy) / sqrt(sum(dx * dx) * sum(dy * dy)), 5)
          .as("acf"),
        count(lit(1)).as("n"))
  }

  /** Ljung–Box portmanteau test per group: Q = n(n+2)·Σₖ ρ̂ₖ²/(n−k)
    * over lags 1..maxLag — "is this series white noise at ALL short
    * lags jointly", the one-number residual-autocorrelation gate that
    * reading [[acfTable]]'s correlogram spike-by-spike can't give
    * (h near-threshold lags compound into a decisive Q). Uses the
    * textbook LB convention: ρ̂ₖ centers on the OVERALL group mean
    * with the full-series Σ(y−ȳ)² denominator (not the pairwise
    * Pearson [[acfTable]] reports, which re-centers per lag).
    *
    * Callers pass an integer-quantized value column (cents), so
    * every distributed sum is exact: n, S=Σy, Q=Σy² plus per-lag
    * cntₖ, Cₖ=Σy_t·y_{t−k}, Aₖ=Σ_{t>k}y_t, Bₖ=Σ_{t>k}y_{t−k} — all
    * decimal(38,0), order-free. ρ̂ₖ is then assembled in ONE fixed
    * double expression over those exact moments
    * (numₖ = Cₖ − ȳ(Aₖ+Bₖ) + cntₖȳ², den = Q − S²/n), identical
    * operands ⇒ identical result on any engine/partitioning.
    * Exact-to-double bound: moments stay < 2⁵³ up to ~9e15 in Σy²
    * (cent values ≤1e5 ⇒ ~1e9 group rows); beyond that both engines
    * still round the same decimal identically, but document sf.
    * Groups with n ≤ maxLag or zero variance report NULL (no test).
    *
    * Returns (group, n, rho_1..rho_maxLag, lb_stat, df).
    *
    * Scale shape: ONE group-partitioned window sort producing the L
    * lag columns (L a query constant), then ONE map-side-combinable
    * grouped agg of 4L+3 exact moments — no melt, no second shuffle,
    * no join. The assembly is a scan-free projection per group row. */
  def ljungBox(df: DataFrame, groupCol: String,
               orderCols: Seq[org.apache.spark.sql.Column],
               valueCol: Column, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && orderCols.nonEmpty)
    val (moments, rho, den) = lbMoments(df, groupCol, orderCols,
      valueCol, maxLag)
    val n = col("_n").cast("double")
    val lb = (1 to maxLag).map(k =>
      rho(k) * rho(k) / col(s"_cnt$k").cast("double"))
      .reduce(_ + _) * n * (n + 2)
    val ok = col("_n") > maxLag && den > 0
    moments.select(Seq(col(groupCol), col("_n").as("n")) ++
      (1 to maxLag).map(k =>
        round(when(ok, rho(k)), 6).as(s"rho_$k")) ++
      Seq(round(when(ok, lb), 6).as("lb_stat"),
        lit(maxLag).as("df")): _*)
  }

  /** Shared exact-moment autocorrelation core for [[ljungBox]] and
    * [[pacf]]: ONE group-partitioned window sort producing the L lag
    * columns, ONE grouped agg of 4L+3 decimal(38,0) moments, and the
    * textbook overall-mean ρ̂ₖ assembled as a fixed double expression
    * over those exact sums (see [[ljungBox]] for the determinism
    * argument). Returns (moments relation, ρ̂ builder, variance
    * denominator column). */
  private def lbMoments(df: DataFrame, groupCol: String,
                        orderCols: Seq[org.apache.spark.sql.Column],
                        valueCol: Column, maxLag: Int)
      : (DataFrame, Int => Column, Column) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val dec = "decimal(38,0)"
    val lagged = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(Seq(col(groupCol), valueCol.cast("long").as("_y")) ++
        (1 to maxLag).map(k => lag(valueCol.cast("long"), k).over(w)
          .as(s"_x$k")): _*)
    val aggs = Seq(
        sum(col("_y").cast(dec)).as("_s"),
        sum((col("_y") * col("_y")).cast(dec)).as("_q")) ++
      (1 to maxLag).flatMap(k => Seq(
        count(col(s"_x$k")).as(s"_cnt$k"),
        sum((col("_y") * col(s"_x$k")).cast(dec)).as(s"_c$k"),
        sum(when(col(s"_x$k").isNotNull, col("_y")).cast(dec))
          .as(s"_a$k"),
        sum(col(s"_x$k").cast(dec)).as(s"_b$k")))
    val moments = lagged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), aggs: _*)
    val n = col("_n").cast("double")
    val ybar = col("_s").cast("double") / n
    val den = col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double") / n
    // ANSI guard: divide by NULL (not 0) on zero-variance groups —
    // subexpression elimination can hoist ρ̂ out of the callers'
    // when() gates, so the division itself must be throw-free
    val denSafe = when(den =!= 0, den)
    def rho(k: Int): Column =
      (col(s"_c$k").cast("double") -
        ybar * (col(s"_a$k").cast("double") + col(s"_b$k").cast("double")) +
        col(s"_cnt$k").cast("double") * ybar * ybar) / denSafe
    (moments, rho, den)
  }

  /** Partial autocorrelation at lags 1..3 per group via the
    * Durbin–Levinson recursion unrolled to fixed depth — the
    * AR-order signature read: where [[acfTable]]/[[ljungBox]]'s ACF
    * tails off geometrically for ANY AR process, the PACF CUTS OFF
    * after lag p, so "which lag does the direct dependence stop at"
    * is a PACF question the correlogram can't answer. Closed forms:
    * φ₁₁ = ρ₁; φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²), φ₂₁ = ρ₁−φ₂₂ρ₁;
    * φ₃₃ = (ρ₃−φ₂₁ρ₂−φ₂₂ρ₁)/(1−φ₂₁ρ₁−φ₂₂ρ₂). Depth 3 keeps the
    * oracle dual hand-writable; deeper orders are the same recursion
    * (and at the 100 TB read you fit AR models, not eyeball lag 7).
    *
    * ρ̂ₖ uses [[ljungBox]]'s exact-integer moment machinery (overall
    * mean, full-series denominator), so the whole table is a fixed
    * double assembly over order-free decimal(38,0) sums. Groups with
    * n ≤ 3 or zero variance report NULL throughout; a zero
    * level-2/level-3 denominator (perfectly correlated series)
    * yields NULL at that level only.
    *
    * Returns (group, n, rho_1..rho_3, pacf_1..pacf_3).
    *
    * Scale shape: identical to [[ljungBox]] — one window sort, one
    * map-side-combinable agg, scan-free assembly. */
  def pacf(df: DataFrame, groupCol: String,
           orderCols: Seq[org.apache.spark.sql.Column],
           valueCol: Column): DataFrame = {
    val (moments, rho, den) = lbMoments(df, groupCol, orderCols,
      valueCol, 3)
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val d2 = lit(1.0) - r1 * r1
    val p22 = (r2 - r1 * r1) / when(d2 =!= 0, d2)
    val p21 = r1 - p22 * r1
    val d3 = lit(1.0) - p21 * r1 - p22 * r2
    val p33 = (r3 - p21 * r2 - p22 * r1) / when(d3 =!= 0, d3)
    val ok = col("_n") > 3 && den > 0
    moments.select(col(groupCol), col("_n").as("n"),
      round(when(ok, r1), 6).as("rho_1"),
      round(when(ok, r2), 6).as("rho_2"),
      round(when(ok, r3), 6).as("rho_3"),
      round(when(ok, r1), 6).as("pacf_1"),
      round(when(ok && d2 =!= 0, p22), 6).as("pacf_2"),
      round(when(ok && d2 =!= 0 && d3 =!= 0, p33), 6).as("pacf_3"))
  }

  /** Record-count randomness test per group: in an i.i.d. series the
    * number of running-maximum records among n observations has mean
    * Hₙ = Σ1/k and variance Hₙ − Hₙ⁽²⁾ (k-th observation is a record
    * with probability 1/k, independently) — too many records =
    * upward drift, too few = early peak / decaying scale. The
    * extreme-value cousin of [[runsTest]]'s sign read: records see
    * TREND IN THE TAILS that median signs can't.
    *
    * Determinism: the record flag is a strict > against the previous
    * running max (ties are not records — documented convention), R
    * and n are integers, and both harmonic sums ride as EXACT int64
    * ⌊10¹²/k⌋-quantized series folded per group (a constant-time
    * lambda over sequence(1, n) — no data pass). One z assembly.
    * NULL z when n < 2 or variance ≤ 0.
    *
    * Returns (group, n, n_records, expected, z).
    *
    * Scale shape: one group-partitioned window sort (running max),
    * one map-side agg; the harmonic fold is per-GROUP-ROW compute,
    * not per data row (array-bounded to ~2³¹ observations per
    * group; beyond that swap the fold for Hₙ ≈ ln n + γ + 1/2n —
    * error < 1e-16 there, far below the quantizer). */
  def recordsTest(df: DataFrame, groupCol: String,
                  orderCols: Seq[org.apache.spark.sql.Column],
                  valueCol: Column): DataFrame = {
    require(orderCols.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val y = valueCol.cast("long")
    val flagged = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), y.as("_y"),
        max(y).over(w).as("_pm"))
      .select(col("_g"),
        when(col("_pm").isNull || col("_y") > col("_pm"), 1L)
          .otherwise(0L).as("_rec"))
    val agg = flagged.groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n"), sum("_rec").as("n_records"))
      .withColumn("_hq", expr(
        "aggregate(sequence(1, cast(n as int)), 0L, " +
          "(acc, k) -> acc + cast(floor(1e12 / k + 0.5) as long))"))
      .withColumn("_h2q", expr(
        "aggregate(sequence(1, cast(n as int)), 0L, " +
          "(acc, k) -> acc + cast(floor(1e12 / (cast(k as bigint) * k) " +
          "+ 0.5) as long))"))
    val h = col("_hq").cast("double") / 1e12
    val v = h - col("_h2q").cast("double") / 1e12
    val z = (col("n_records").cast("double") - h) / sqrt(when(v > 0, v))
    agg.select(col(groupCol), col("n"), col("n_records"),
      round(h, 6).as("expected"),
      round(when(col("n") >= 2 && v > 0, z), 6).as("z"))
  }

  /** Gumbel tail fit from block maxima (method of moments): chunk
    * each series into complete `blockSize`-observation blocks, take
    * block maxima, and fit the Gumbel(μ, β) the maxima of light-
    * tailed data converge to — β = s·√6/π, μ = m̄ − γβ (Euler's γ) —
    * then read off the T-block return level μ + β·(−ln(−ln(1−1/T))):
    * "the value exceeded once per T blocks", the capacity-planning
    * number a p99 can't give (p99 interpolates the data; the return
    * level EXTRAPOLATES the tail law).
    *
    * Exactness: block maxima are integers (one grouped max over the
    * index-block key), their two moments are exact
    * int64/decimal(38,0), and μ/β/return level are ONE fixed double
    * assembly (√6/π and γ as shared literals, mirrored in the
    * oracle). NULL when fewer than 2 complete blocks or zero
    * variance.
    *
    * Returns (group, n_blocks, gumbel_loc, gumbel_scale, rl_t).
    *
    * Scale shape: one group window sort for row indices, one
    * (group, block) max reduction, one group agg — [[hurst]]'s cost
    * class at a single block size. */
  def gumbelFit(df: DataFrame, groupCol: String,
                orderCols: Seq[org.apache.spark.sql.Column],
                valueCol: Column, blockSize: Int = 64,
                returnPeriod: Int = 100): DataFrame = {
    require(blockSize >= 2 && returnPeriod >= 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val dec = "decimal(38,0)"
    val idx = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_y"),
        (row_number().over(w) - 1).cast("long").as("_i"))
    val blocks = idx.groupBy(col("_g"), expr(s"_i div $blockSize"))
      .agg(max("_y").as("_m"), count(lit(1)).as("_c"))
      .filter(col("_c") === blockSize)
    val m = blocks.groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("_m").cast(dec)).as("_s"),
        sum((col("_m") * col("_m")).cast(dec)).as("_q"))
    val nb = col("n_blocks").cast("double")
    def d(c: String) = col(c).cast("double")
    val mean = d("_s") / nb
    val varS = (nb * d("_q") - d("_s") * d("_s")) /
      when(nb * (nb - 1) > 0, nb * (nb - 1))
    val beta = sqrt(when(varS > 0, varS)) * sqrt(lit(6.0)) /
      lit(math.Pi)
    val mu = mean - lit(0.5772156649015329) * beta
    val yT = -log(-log(lit(1.0) - lit(1.0) / returnPeriod))
    val ok = col("n_blocks") >= 2 && varS > 0
    m.select(col(groupCol), col("n_blocks"),
      round(when(ok, mu), 6).as("gumbel_loc"),
      round(when(ok, beta), 6).as("gumbel_scale"),
      round(when(ok, mu + beta * yT), 6).as("rl_t"))
  }

  /** Hurst exponent per group by the aggregated-variance method:
    * block-average the series at sizes m ∈ {1,2,4,8,16}; for
    * long-range-dependent series Var(X̄ₘ) ∝ m^(2H−2), so H falls out
    * of the log-log slope — H ≈ 0.5 is memoryless, H → 1 is
    * persistent (trends compound), H < 0.5 anti-persistent. The
    * long-memory read [[ljungBox]]'s fixed-lag window can't give
    * (LRD lives in the TAIL of the correlogram).
    *
    * Because the five m are FIXED dyadic constants, log m is equally
    * spaced (0,L,2L,3L,4L with L = ln 2) and the OLS slope collapses
    * to the closed form (−2y₁ − y₂ + y₈ + 2y₁₆)/(10L) over
    * yₘ = ln Var(X̄ₘ): no distributed double sum anywhere. Each
    * Var(X̄ₘ) is assembled from exact integers (complete-block sums
    * of the quantized series; b·Σs²−(Σs)² in decimal(38,0)), its log
    * is quantized to int64 at 1e-12, and the slope is an EXACT
    * integer combination of those — one division by 10·ln2 at the
    * end. Groups missing any level (fewer than 2 complete blocks at
    * m=16, i.e. n < 32, or a zero variance) report NULL.
    *
    * Returns (group, n, h_est).
    *
    * Scale shape: one group window sort for row indices, a constant
    * ×5 block-id fan-out, two map-side-combinable aggs ((g,m,block)
    * then (g,m)), and a 5-column conditional pivot per group — no
    * self-join, no per-m pass over the data. */
  def hurst(df: DataFrame, groupCol: String,
            orderCols: Seq[org.apache.spark.sql.Column],
            valueCol: Column): DataFrame = {
    require(orderCols.nonEmpty)
    val ms = Seq(1, 2, 4, 8, 16)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    val idx = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_y"),
        (row_number().over(w) - 1).cast("long").as("_i"))
    val fan = idx.select(col("_g"), col("_y"),
        explode(array(ms.map(m =>
          struct(lit(m).as("m"), expr(s"_i div $m").as("blk"))): _*))
          .as("_e"))
      .select(col("_g"), col("_e.m").as("_m"), col("_e.blk").as("_blk"),
        col("_y"))
    val blocks = fan.groupBy(col("_g"), col("_m"), col("_blk"))
      .agg(sum("_y").as("_s"), count(lit(1)).as("_c"))
      .filter(col("_c") === col("_m"))
    val dec = "decimal(38,0)"
    val lvl = blocks.groupBy(col("_g"), col("_m"))
      .agg(count(lit(1)).as("_b"), sum(col("_s").cast(dec)).as("_ss"),
        sum((col("_s") * col("_s")).cast(dec)).as("_sq"))
    val bd = col("_b").cast("double")
    val md = col("_m").cast("double")
    val num = (col("_b").cast(dec) * col("_sq") -
      col("_ss") * col("_ss")).cast("double")
    val vMean = num / when(bd * (bd - 1) > 0, bd * (bd - 1)) / (md * md)
    val yq = floor(log(when(vMean > 0, vMean)) * 1e12 + lit(0.5))
      .cast("long")
    val pivCols = ms.map(m =>
      max(when(col("_m") === m, col("_yq"))).as(s"_y$m"))
    val piv = lvl.select(col("_g"), col("_m"), yq.as("_yq"))
      .groupBy(col("_g"))
      .agg(pivCols.head, pivCols.tail: _*)
    val icomb = lit(-2L) * col("_y1") - col("_y2") + col("_y8") +
      lit(2L) * col("_y16")
    val slope = icomb.cast("double") / 1e12 / (lit(10.0) * log(lit(2.0)))
    val h = lit(1.0) + slope / 2
    val n = idx.groupBy(col("_g").as("_gn")).agg(count(lit(1)).as("n"))
    piv.join(n, col("_g") === col("_gn")).drop("_gn")
      .select(col("_g").as(groupCol), col("n"),
        round(when(col("_y1").isNotNull && col("_y2").isNotNull &&
          col("_y4").isNotNull && col("_y8").isNotNull &&
          col("_y16").isNotNull, h), 6).as("h_est"))
  }

  /** Wald–Wolfowitz runs test per group: is the sequence of
    * above/below-median outcomes RANDOM in time order, or does it
    * cluster (too few runs — regime persistence, unshuffled data) or
    * alternate (too many — negative feedback)? The ordering-sanity
    * gate that [[ljungBox]]'s linear-correlation read can miss
    * (runs are sign-level, robust to any monotone transform).
    * Values exactly equal to the median are dropped (classic
    * above/below convention); R counts maximal same-sign stretches;
    * z = (R − E)/√V with E = 2n₁n₂/n + 1 and
    * V = 2n₁n₂(2n₁n₂−n)/(n²(n−1)).
    *
    * Exactness: the median of the integer-quantized value is the
    * exact interpolated percentile (= DuckDB `median`), the sign
    * flags / run count / n₁ / n₂ are integers, and E/V/z is ONE
    * fixed double expression over them. Degenerate groups (all one
    * side, n < 2, zero variance of V) report NULL z.
    *
    * Returns (group, n, n_above, n_below, runs, z).
    *
    * Scale shape: one map-side-combinable exact-percentile agg
    * reduced to a per-group broadcast, one group-partitioned window
    * sort for the run flags, one final grouped agg — no self-join,
    * run counting is the lag-inequality sum. */
  def runsTest(df: DataFrame, groupCol: String,
               orderCols: Seq[org.apache.spark.sql.Column],
               valueCol: Column): DataFrame = {
    require(orderCols.nonEmpty)
    val base = df.filter(col(groupCol).isNotNull && valueCol.isNotNull)
      .select(Seq(col(groupCol).as("_g"), valueCol.cast("long").as("_y")) ++
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }: _*)
    val med = base.groupBy(col("_g"))
      .agg(expr("percentile(_y, 0.5)").as("_med"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g"))
      .orderBy(orderCols.indices.map(i => col(s"_o$i")): _*)
    val up = col("_y").cast("double") > col("_med")
    val flagged = base.join(broadcast(med), Seq("_g"))
      .filter(col("_y").cast("double") =!= col("_med"))
      .select(col("_g"), up.cast("int").as("_up"),
        when(lag(up.cast("int"), 1).over(w).isNull ||
          lag(up.cast("int"), 1).over(w) =!= up.cast("int"), 1L)
          .otherwise(0L).as("_newrun"))
    val m = flagged.groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n"), sum("_up").as("n_above"),
        (count(lit(1)) - sum("_up")).as("n_below"),
        sum("_newrun").as("runs"))
    val (n, n1, n2) = (col("n").cast("double"),
      col("n_above").cast("double"), col("n_below").cast("double"))
    val e = lit(2.0) * n1 * n2 / n + 1
    // ANSI guard: NULL divisor at n=1 (single surviving row)
    val vDen = n * n * (n - 1)
    val v = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
      when(vDen > 0, vDen)
    val z = (col("runs").cast("double") - e) / sqrt(when(v > 0, v))
    m.select(col(groupCol), col("n"), col("n_above"), col("n_below"),
      col("runs"), round(when(v > 0, z), 6).as("z"))
  }

  /** Theil–Sen robust slope per group: the median over all pairwise
    * slopes (yⱼ−yᵢ)/(xⱼ−xᵢ) with xᵢ < xⱼ — the trend estimator that
    * tolerates ~29% outlier contamination where OLS folds at one bad
    * point. Equal-x pairs are skipped (classic formulation); the
    * median is Spark's exact interpolated `percentile` = DuckDB
    * `median`/`quantile_cont`, so given cross-engine-identical
    * (x, y) inputs the whole estimator is oracle-exact.
    *
    * Exact QUADRATIC formulation: the within-group self-join makes
    * ~n²/2 slope rows per group — right for many SMALL series (the
    * per-key trend read-out this registers on; n=100 points is 5k
    * slopes). The 100 TB path for long series is pair sampling or
    * Siegel's per-point repeated median, both reusing this median
    * machinery — swapping the pair generator, not the shape. Plan:
    * one group-key equi-join (never a cross join) with the slope
    * codegen'd join-side, then one grouped exact percentile (sorts
    * within group only). */
  /** Siegel repeated-median slope per group: for each point i, the
    * median slope to every OTHER point, then the median of those
    * per-point medians — the 50%-breakdown upgrade of [[theilSen]]
    * (Theil–Sen folds at ~29% contamination because one bad point
    * poisons n−1 pairs; Siegel's inner median quarantines it to ONE
    * per-point row). Siegel 1982; equal-x pairs skipped (classic).
    *
    * Determinism: both median layers are the exact interpolated
    * percentile (= DuckDB `median`), slopes are one IEEE division of
    * integer-quantized coordinates — engine-exact given identical
    * inputs. Points must have DISTINCT x within a group (pass an
    * aggregated series — per-day totals — not raw events); duplicate
    * x would merge per-point slope sets.
    *
    * Returns (group, siegel_slope, n_points).
    *
    * Scale shape: the same group-keyed quadratic pair join as
    * [[theilSen]] (right for many SMALL series; the documented
    * long-series path is pair sampling), then a per-(group, point)
    * exact percentile and a per-group exact percentile — two
    * grouped sorts, no global stage. */
  def siegelSlope(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("_g"), col(xCol).as("_x1"),
      col(yCol).as("_y1"))
    val b = df.select(col(groupCol).as("_g"), col(xCol).as("_x2"),
      col(yCol).as("_y2"))
    val inner = a.join(b, Seq("_g")).filter(col("_x1") =!= col("_x2"))
      .select(col("_g"), col("_x1"),
        ((col("_y2") - col("_y1")).cast("double") /
          (col("_x2") - col("_x1")).cast("double")).as("_s"))
      .groupBy(col("_g"), col("_x1"))
      .agg(expr("percentile(_s, 0.5)").as("_med"))
    inner.groupBy(col("_g").as(groupCol))
      .agg(round(expr("percentile(_med, 0.5)"), 6).as("siegel_slope"),
        count(lit(1)).as("n_points"))
  }

  def theilSen(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("_g"), col(xCol).as("_x1"),
      col(yCol).as("_y1"))
    val b = df.select(col(groupCol).as("_g"), col(xCol).as("_x2"),
      col(yCol).as("_y2"))
    a.join(b, Seq("_g")).filter(col("_x1") < col("_x2"))
      .select(col("_g"),
        ((col("_y2") - col("_y1")).cast("double") /
          (col("_x2") - col("_x1")).cast("double")).as("_s"))
      .groupBy(col("_g").as(groupCol))
      .agg(round(expr("percentile(_s, 0.5)"), 6).as("theil_sen_slope"),
        count(lit(1)).as("n_pairs"))
  }

  def resampleFill(obs: DataFrame, keyCol: String, tsUsCol: String,
                   payload: Seq[String], stepUs: Long,
                   tiebreak: Seq[String]): DataFrame = {
    require(stepUs >= 1 && payload.nonEmpty)
    val clean = obs.filter(col(keyCol).isNotNull)
    val span = clean.groupBy(col(keyCol))
      .agg(min(col(tsUsCol).cast("long")).as("_lo"),
        max(col(tsUsCol).cast("long")).as("_hi"))
    // ceil(lo/step) .. floor(hi/step): non-negative epochs, `div`
    // truncation == floor; ceil via the remainder case
    val pLo = when(col("_lo") % stepUs === 0, expr(s"_lo div ${stepUs}L"))
      .otherwise(expr(s"_lo div ${stepUs}L") + 1)
    // guard: a span with no aligned instant must yield ZERO rows —
    // Spark's sequence(a, b) with a > b generates a DESCENDING range
    // (unlike SQL generate_series, which is empty)
    val grid = span
      .filter(pLo <= expr(s"_hi div ${stepUs}L"))
      .select(col(keyCol), explode(sequence(pLo,
        expr(s"_hi div ${stepUs}L"))).as("_p"))
      .select(col(keyCol), (col("_p") * stepUs).as("grid_us"))
    // +1 turns asOfUnion's strictly-before into at-or-before: an
    // observation exactly ON the grid instant fills it
    AsOfJoin.asOfUnion(grid, clean, keyCol, keyCol,
      col("grid_us") + 1, col(tsUsCol).cast("long"),
      payload, tiebreak)
  }

  /** Linear interpolation onto a regular grid — the smooth upgrade of
    * [[resampleFill]]'s step-function ffill: each grid instant takes
    * the straight line between its nearest at-or-before and
    * strictly-after observations (edges fall back to ffill/bfill).
    * The interpolation expression is written identically in the
    * DuckDB dual, so the doubles — and the rounded read-out — are
    * engine-identical.
    *
    * Scale shape: grid rows UNION with observations into ONE
    * key-partitioned window pass (two ignore-null frames over one
    * sort — no self-join, no per-gap explode). Grid size is bounded
    * by span/step per key; ties at one instant resolve by the
    * explicit (_t, _isGrid, _v) order so duplicates can't flake the
    * neighbor choice. */
  def interpolateLinear(obs: DataFrame, keyCol: String, tsUsCol: String,
                        valCol: String, stepUs: Long): DataFrame = {
    require(stepUs >= 1)
    val clean = obs.filter(col(keyCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol), col(tsUsCol).cast("long").as("_t"),
        col(valCol).cast("double").as("_v"))
    val span = clean.groupBy(col(keyCol))
      .agg(min("_t").as("_lo"), max("_t").as("_hi"))
    val pLo = when(col("_lo") % stepUs === 0, expr(s"_lo div ${stepUs}L"))
      .otherwise(expr(s"_lo div ${stepUs}L") + 1)
    val grid = span
      .filter(pLo <= expr(s"_hi div ${stepUs}L"))
      .select(col(keyCol),
        explode(sequence(pLo, expr(s"_hi div ${stepUs}L"))).as("_p"))
      .select(col(keyCol), (col("_p") * stepUs).as("_t"),
        lit(null).cast("double").as("_v"), lit(1).as("_isGrid"))
    val pts = clean.withColumn("_isGrid", lit(0)).unionByName(grid)
    val ord = Seq(col("_t"), col("_isGrid"), col("_v"))
    val wPrev = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val pv = last(col("_v"), ignoreNulls = true).over(wPrev)
    val pt = last(when(col("_v").isNotNull, col("_t")), ignoreNulls = true)
      .over(wPrev)
    val nv = first(col("_v"), ignoreNulls = true).over(wNext)
    val nt = first(when(col("_v").isNotNull, col("_t")), ignoreNulls = true)
      .over(wNext)
    pts
      .withColumn("_interp",
        when(pv.isNotNull && nv.isNotNull,
          pv + (nv - pv) *
            ((col("_t") - pt).cast("double") / (nt - pt).cast("double")))
          .when(pv.isNotNull, pv)
          .otherwise(nv))
      .filter(col("_isGrid") === 1)
      .select(col(keyCol), col("_t").as("grid_us"),
        round(col("_interp"), 6).as("value"))
  }

  /** STL-lite additive decomposition of a regular series:
    * trend = centered moving average (`±halfWindow` ROWS), seasonal =
    * per-phase mean of the detrended series re-centered to sum ~0,
    * residual = y − trend − seasonal. The classical
    * decompose-by-moving-average (STL without loess) — enough for
    * seasonality-aware anomaly flags downstream, fully
    * window/aggregate-expressible so the DuckDB dual is exact.
    *
    * Scale shape: the series here is an AGGREGATED one (one row per
    * bucket — at 100 TB the groupBy that builds it is the big
    * shuffle, already map-side-combined by the caller). The single
    * global `orderBy` window over bucket rows is fine while buckets ≪
    * input (a year of hours = 8 760 rows); for per-entity seasonality
    * partition the windows by the entity key and nothing is global.
    * Phase means broadcast back via a ≤ `period`-row join.
    */
  def seasonalDecompose(series: DataFrame, idxCol: String, valCol: String,
                        period: Int, halfWindow: Int): DataFrame = {
    require(period >= 2 && halfWindow >= 1)
    val wT = Window.orderBy(col(idxCol))
      .rowsBetween(-halfWindow, halfWindow)
    val det = series
      .select(col(idxCol), col(valCol).cast("double").as("y"))
      .withColumn("trend", avg(col("y")).over(wT))
      .withColumn("phase", pmod(col(idxCol), lit(period)))
    val phaseMeans = det.groupBy("phase")
      .agg(avg(col("y") - col("trend")).as("s_raw"))
      .agg(collect_list(struct(col("phase"), col("s_raw"))).as("ps"),
        avg(col("s_raw")).as("s_bar"))
      .select(explode(col("ps")).as("p"), col("s_bar"))
      .select(col("p.phase").as("phase"),
        (col("p.s_raw") - col("s_bar")).as("seasonal"))
    det.join(broadcast(phaseMeans), Seq("phase"))
      .select(col(idxCol),
        round(col("y"), 6).as("y"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("y") - col("trend") - col("seasonal"), 6).as("resid"))
  }

  /** Mann–Kendall trend test per group: S = Σ_{i<j} sign(v_j − v_i)
    * over the series ordered by `idxCol`, with the tie-corrected
    * normal approximation z — the NON-parametric "is this metric
    * monotonically drifting" answer that [[theilSen]]'s slope
    * magnitude doesn't give (significance) and a linear fit can't
    * give at all (no distribution assumption). One row per group:
    * n, S (exact int), z (positive = upward trend).
    *
    * Exactness: S and the tie term Σt(t−1)(2t+5) are exact int64
    * sums of ±1/0 and small-integer products; Var(S) and z are a
    * handful of correctly-rounded double ops on those integers.
    *
    * Scale shape: same deliberate-quadratic contract as [[theilSen]]
    * — a group-key equi-join producing ~n²/2 sign rows per group,
    * meant for MANY SMALL pre-aggregated series (daily/hourly
    * rollups; n = 365 points is 66k pairs), never raw events. The
    * long-series path is the same pair-sampling swap documented
    * there. */
  def mannKendall(df: DataFrame, groupCol: String, idxCol: String,
                  valCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("_g"), col(idxCol).as("_i1"),
      col(valCol).as("_v1"))
    val b = df.select(col(groupCol).as("_g"), col(idxCol).as("_i2"),
      col(valCol).as("_v2"))
    val s = a.join(b, Seq("_g")).filter(col("_i1") < col("_i2"))
      .groupBy("_g")
      .agg(sum(signum(col("_v2") - col("_v1")).cast("long")).as("s"))
    val ties = df.groupBy(col(groupCol).as("_g"), col(valCol).as("_v"))
      .agg(count(lit(1)).as("_t"))
      .groupBy("_g")
      .agg(count(lit(1)).as("_nv"), sum("_t").as("_n"),
        sum(col("_t") * (col("_t") - 1) * (lit(2L) * col("_t") + 5))
          .as("_tt"))
    val nD = col("_n").cast("double")
    val varS = (nD * (nD - 1) * (lit(2.0) * nD + 5) -
      col("_tt").cast("double")) / 18.0
    val z = when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varS))
      .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    s.join(ties, Seq("_g"))
      .select(col("_g").as(groupCol), col("_n").as("n"), col("s"),
        round(when(varS > 0, z), 6).as("z"))
  }

  /** Rolling median over the trailing k observations per key — the
    * robust local baseline (spike-immune, unlike a rolling mean) for
    * anomaly scoring and sensor smoothing. `valCol` must be INTEGER-
    * quantized (pass cents); the median of a bounded window is then
    * engine-exact: sort the ≤k window values, average the two middle
    * integers (exact in double), de-scale once.
    *
    * Scale shape: ONE window pass per key — the k-bounded frame
    * ships a ≤k array per row through `collect_list` + `array_sort`,
    * no self-join, no k-way explode; memory per row is O(k), k a
    * small constant. Keys partition the sort — nothing global. */
  def rollingMedian(df: DataFrame, keyCol: String, order: Seq[Column],
                    valCol: Column, k: Int,
                    scale: Long = 100L): DataFrame = {
    require(k >= 1 && scale >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-(k - 1).toLong, 0)
    val arr = array_sort(collect_list(valCol.cast("long")).over(w))
    df.withColumn("_arr", arr)
      .withColumn("n_window", size(col("_arr")).cast("long"))
      .withColumn("roll_med", round(
        (expr("element_at(_arr, cast((size(_arr) + 1) div 2 as int))") +
          expr("element_at(_arr, cast(size(_arr) div 2 + 1 as int))"))
          .cast("double") / (2.0 * scale), 6))
      .drop("_arr")
  }

  /** Rolling z-score against the PRIOR k points (exclusive frame):
    * z = (x − μ_prior)/σ_prior — the classic online anomaly score,
    * registered beside [[hampelFilter]] as the deliberately fragile
    * baseline (a spike inflates the very σ meant to catch the next
    * one; Hampel doesn't — the pairing demonstrates why robust wins).
    * The EXCLUSIVE frame keeps the tested point out of its own
    * baseline. Null z when the prior window has < 2 points or zero
    * variance. Adds n_prior, z, is_anomaly (|z| > nSigma).
    *
    * Exactness: prior-window moments are exact (count/sum int64,
    * Σq² decimal(38,0)) over integer-quantized values; μ, σ, z are
    * correctly-rounded doubles on identical operands; the flag
    * compares the ROUNDED z so both engines cut identically.
    *
    * Scale shape: ONE key-partitioned frame window, three sums
    * sharing the sort. */
  def rollingZscore(df: DataFrame, keyCol: String, order: Seq[Column],
                    valCol: Column, k: Int, nSigma: Int = 3,
                    scale: Long = 100L): DataFrame = {
    require(k >= 2 && nSigma >= 1 && scale >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-k.toLong, -1)
    val v = valCol.cast("long")
    val n = count(lit(1)).over(w)
    val s = sum(v).over(w)
    val qq = sum(v.cast("decimal(38,0)") * v).over(w)
    val nD = col("_np").cast("double")
    val mu = col("_sp").cast("double") / nD
    val sd = sqrt((col("_qp").cast("double") - col("_sp").cast("double") *
      col("_sp") / nD) / (nD - 1))
    df.withColumn("_vq", v)
      .withColumn("_np", n).withColumn("_sp", s).withColumn("_qp", qq)
      .withColumn("n_prior", col("_np").cast("long"))
      .withColumn("z", round(when(col("_np") > 1 && sd > 0,
        (col("_vq") - mu) / sd), 6))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > nSigma, lit(false)))
      .drop("_vq", "_np", "_sp", "_qp")
  }

  /** Hampel spike filter: flag points whose deviation from the
    * trailing-k rolling MEDIAN exceeds `nMad` rolling MADs — the
    * robust outlier detector a z-score can't be (one spike inflates
    * the mean AND the σ that's supposed to catch it; median/MAD
    * ignore it). ENTIRELY INTEGER arithmetic: with cent-quantized
    * values, 2·median = lo+hi middle sum (int), 2·|v − med| int per
    * window element, 4·MAD = middle sum of those (int), and the
    * flag is `2·(2·|x − med|) > nMad·(4·MAD)` — no FP boundary
    * anywhere, so the flags are engine- and partitioning-exact.
    * Adds n_window, roll_med (descaled), is_spike.
    *
    * Scale shape: the [[rollingMedian]] shape — ONE key-partitioned
    * frame window shipping a ≤k sorted int array per row; all
    * derived stats come from that one array (no second window). */
  def hampelFilter(df: DataFrame, keyCol: String, order: Seq[Column],
                   valCol: Column, k: Int, nMad: Int = 3,
                   scale: Long = 100L): DataFrame = {
    require(k >= 1 && nMad >= 1 && scale >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-(k - 1).toLong, 0)
    df.withColumn("_v", valCol.cast("long"))
      .withColumn("_arr", array_sort(collect_list(col("_v")).over(w)))
      .withColumn("n_window", size(col("_arr")).cast("long"))
      // 2*median of the window, an exact integer
      .withColumn("_med2",
        expr("element_at(_arr, cast((size(_arr) + 1) div 2 as int))") +
          expr("element_at(_arr, cast(size(_arr) div 2 + 1 as int))"))
      // 2*|v_i - med| per element, sorted -> middle sum = 4*MAD
      .withColumn("_dev2",
        array_sort(transform(col("_arr"), v => abs(lit(2L) * v - col("_med2")))))
      .withColumn("_mad4",
        expr("element_at(_dev2, cast((size(_dev2) + 1) div 2 as int))") +
          expr("element_at(_dev2, cast(size(_dev2) div 2 + 1 as int))"))
      .withColumn("roll_med",
        round(col("_med2").cast("double") / (2.0 * scale), 6))
      .withColumn("is_spike",
        lit(2L) * abs(lit(2L) * col("_v") - col("_med2")) >
          lit(nMad.toLong) * col("_mad4"))
      .drop("_v", "_arr", "_med2", "_dev2", "_mad4")
  }

  /** Cross-correlation lag finder: Pearson correlation between
    * x at time t and y at time t+lag for every lag 0..maxLag over an
    * integer-indexed series — "clicks lead purchases by WHICH day",
    * the lead/lag read a single contemporaneous correlation hides.
    * One row per lag: (lag, n, xcorr); pick the argmax downstream.
    * Lags with fewer than 2 aligned points or a locally constant
    * side return null.
    *
    * Exactness: per-lag moments accumulate in decimal(38,0) over
    * INTEGER-quantized values (exact, order-free); each correlation
    * is correctly-rounded double ops on identical operands.
    *
    * Scale shape: bounded-series contract (daily/hourly rollups,
    * the mannKendall posture): a (maxLag+1)-way explode of the
    * bounded series equi-joined on shifted index — |series|·lags
    * rows total, one lag-key agg. */
  def xcorrLag(series: DataFrame, idxCol: Column, xCol: Column,
               yCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 0)
    val a = series.filter(idxCol.isNotNull && xCol.isNotNull)
      .select(idxCol.cast("long").as("_i"), xCol.cast("long").as("_x"))
      .select(col("_i"), col("_x"),
        explode(sequence(lit(0), lit(maxLag))).as("lag"))
    val b = series.filter(idxCol.isNotNull && yCol.isNotNull)
      .select(idxCol.cast("long").as("_j"), yCol.cast("long").as("_y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val sums = a.join(b, col("_i") + col("lag") === col("_j"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("_x")) * col("_y")).as("_sxy"),
        sum(dec(col("_x")) * col("_x")).as("_sxx"),
        sum(dec(col("_y")) * col("_y")).as("_syy"),
        sum(dec(col("_x"))).as("_sx"), sum(dec(col("_y"))).as("_sy"))
    val nDec = dec(col("n"))
    val num = (nDec * col("_sxy") - col("_sx") * col("_sy")).cast("double")
    val vx = (nDec * col("_sxx") - col("_sx") * col("_sx")).cast("double")
    val vy = (nDec * col("_syy") - col("_sy") * col("_sy")).cast("double")
    sums.select(col("lag").cast("long").as("lag"), col("n"),
      round(when(col("n") > 1 && vx > 0 && vy > 0,
        num / sqrt(vx * vy)), 6).as("xcorr"))
  }

  /** Rolling Pearson correlation between two INTEGER-quantized
    * series over the trailing k points — "are these metrics locally
    * coupled, and when did they decouple": the windowed companion to
    * a global correlation, which averages regime changes away.
    * Output adds n_window and roll_corr (null when the window has
    * fewer than 2 points or either series is locally constant).
    *
    * Exactness: all five windowed moment sums (Σx, Σy, Σxy, Σx²,
    * Σy²) accumulate in decimal(38,0) — daily cent totals reach
    * ~10¹⁰ and their products 10²⁰, past int64; decimal is exact and
    * order-free. The correlation is then a handful of correctly-
    * rounded double ops on identical operands.
    *
    * Scale shape: ONE frame window per partition key — five sums
    * share the single sort; no self-join. Partition by the series
    * key, or run over a BOUNDED pre-aggregated series (daily
    * rollups) when global, the documented bounded-window pattern. */
  def rollingCorr(df: DataFrame, partitionCols: Seq[Column],
                  order: Seq[Column], xCol: Column, yCol: Column,
                  k: Int): DataFrame = {
    require(k >= 2)
    val base = org.apache.spark.sql.expressions.Window
    val w0 = if (partitionCols.isEmpty) base.orderBy(order: _*)
      else base.partitionBy(partitionCols: _*).orderBy(order: _*)
    val w = w0.rowsBetween(-(k - 1).toLong, 0)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val x = dec(xCol.cast("long"))
    val y = dec(yCol.cast("long"))
    val n = dec(count(lit(1)).over(w))
    val sx = sum(x).over(w)
    val sy = sum(y).over(w)
    val num = (n * sum(x * y).over(w) - sx * sy).cast("double")
    val vx = (n * sum(x * x).over(w) - sx * sx).cast("double")
    val vy = (n * sum(y * y).over(w) - sy * sy).cast("double")
    df.withColumn("n_window", count(lit(1)).over(w).cast("long"))
      .withColumn("roll_corr",
        round(when(col("n_window") > 1 && vx > 0 && vy > 0,
          num / sqrt(vx * vy)), 6))
  }

  /** Seasonal-naive backtest (MASE-style): per group, score the
    * "same slot last season" forecast (`x_{t−season}`) against the
    * one-step naive baseline (`x_{t−1}`) on the SAME evaluation
    * rows — the five-minute answer to "does this series even have
    * usable seasonality before anyone fits a model". mase < 1: the
    * seasonal lag beats naive persistence; ≥ 1: don't bother.
    * Returns per group: (group, n_eval, mae_seasonal, mae_naive,
    * mase — NULL when the naive MAE is 0).
    *
    * Exactness: callers pass integer-quantized x; both error sums
    * are exact int64 over |differences|; the two MAEs and their
    * ratio are fixed double expressions.
    *
    * Scale shape: the bounded-series contract (per-group
    * daily/hourly rollups): two lag frames over one per-group sort,
    * then a map-side verdict agg. */
  def seasonalNaiveBacktest(series: DataFrame, groupCol: String,
                            tCol: Column, xCol: Column, season: Int,
                            scale: Long = 100L): DataFrame = {
    require(season >= 2 && scale >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("_g").orderBy("_t")
    series.filter(tCol.isNotNull && xCol.isNotNull)
      .select(col(groupCol).as("_g"), tCol.cast("long").as("_t"),
        xCol.cast("long").as("_x"))
      .withColumn("_fs", lag("_x", season).over(w))
      .withColumn("_fn", lag("_x", 1).over(w))
      .filter(col("_fs").isNotNull && col("_fn").isNotNull)
      .groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("_x") - col("_fs"))).as("_es"),
        sum(abs(col("_x") - col("_fn"))).as("_en"))
      .select(col(groupCol), col("n_eval"),
        round(col("_es").cast("double") / col("n_eval") / scale, 6)
          .as("mae_seasonal"),
        round(col("_en").cast("double") / col("n_eval") / scale, 6)
          .as("mae_naive"),
        round(when(col("_en") > 0,
          col("_es").cast("double") / col("_en")), 6).as("mase"))
  }

  /** Out-of-orderness audit: per key, how badly event TIME disagrees
    * with ARRIVAL order — the measurement that turns "pick a
    * watermark delay" from folklore into data: a row is LATE when
    * its event time is behind the running max over everything that
    * arrived before it, and `max_lag` is the watermark delay that
    * would have admitted every late row for that key. Returns
    * (key, n_events, n_late, late_rate, max_lag — NULL when the key
    * is perfectly ordered).
    *
    * Scale shape: one arrival-ordered window per key (in production
    * the arrival column is the log offset, so the window rides the
    * source's native order) folding straight into a map-side-
    * combinable per-key verdict. */
  def outOfOrderAudit(events: DataFrame, keyCol: String,
                      arrivalCol: Column, tsCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(arrivalCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    events.filter(col(keyCol).isNotNull && arrivalCol.isNotNull &&
        tsCol.isNotNull)
      .withColumn("_pm", max(tsCol).over(w))
      .withColumn("_late", col("_pm").isNotNull && tsCol < col("_pm"))
      .withColumn("_lag", when(col("_late"), col("_pm") - tsCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("_late"), 1L).otherwise(0L)).as("n_late"),
        round(sum(when(col("_late"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("late_rate"),
        max("_lag").cast("long").as("max_lag"))
  }

  /** Single-split binary-segmentation changepoint: per group, the
    * boundary that maximizes the between-segment sum-of-squares
    * reduction `S_l²/n_l + S_r²/n_r − S²/n` — the first (and often
    * only needed) step of the classic changepoint recursion, and the
    * "did the level shift, and WHEN" read that CUSUM's sequential
    * drift alarm ([[cusumDrift]]) doesn't give directly. Ties break
    * to the EARLIEST boundary. Returns one row per group: split
    * point (last t of the left segment), segment sizes, segment
    * means, and the gain.
    *
    * Exactness: callers pass integer-quantized x (pre-aggregated
    * counts/cents), so prefix sums are exact int64; each gain is a
    * fixed double expression over those integers — identical
    * operands and op order in any engine, with the deterministic
    * (gain DESC, t) tiebreak on top.
    *
    * Scale shape: bounded-series contract (daily/hourly rollups per
    * group — the mannKendall/xcorr posture): two frame windows and
    * one rank window over the bounded per-group series; the raw
    * corpus reduces to that series in one map-side-combinable agg
    * upstream. */
  def changepoint(series: DataFrame, groupCol: String, tCol: Column,
                  xCol: Column, scale: Long = 1L): DataFrame = {
    require(scale >= 1)
    import org.apache.spark.sql.expressions.Window
    val base = series.filter(tCol.isNotNull && xCol.isNotNull)
      .select(col(groupCol).as("_g"), tCol.cast("long").as("_t"),
        xCol.cast("long").as("_x"))
    val wCum = Window.partitionBy("_g").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("_g")
    val sr = (col("_s") - col("_sl")).cast("double")
    val nr = (col("_n") - col("_nl"))
    val gain = col("_sl").cast("double") * col("_sl") / col("_nl") +
      sr * (col("_s") - col("_sl")) / nr -
      col("_s").cast("double") * col("_s") / col("_n")
    val pick = Window.partitionBy("_g")
      .orderBy(col("_gain").desc, col("_t"))
    base
      .withColumn("_nl", count(lit(1)).over(wCum))
      .withColumn("_sl", sum("_x").over(wCum))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_s", sum("_x").over(wAll))
      .filter(col("_nl") < col("_n"))
      .withColumn("_gain", gain)
      .withColumn("_rn", row_number().over(pick))
      .filter(col("_rn") === 1)
      .select(col("_g").as(groupCol), col("_t").as("t_split"),
        col("_nl").as("n_left"), nr.as("n_right"),
        round(col("_sl").cast("double") / col("_nl") / scale, 6)
          .as("mean_left"),
        round(sr / nr / scale, 6).as("mean_right"),
        // gain ships UNROUNDED: its magnitude is ~(Σx)²/n, and
        // decimal rounding a double that large is itself lossy in
        // some engines (×10⁶ exceeds 2⁵³ — DuckDB's round() drifts
        // ulps there). The raw double IS engine-identical: every
        // operand is an exact int64 and the expression is three
        // IEEE mult/div terms in fixed order.
        (col("_gain") / (scale.toDouble * scale)).as("gain"))
  }

  /** Page–Hinkley mean-shift detector per series: the sequential
    * change test behind many stream-drift monitors, made declarative.
    * Per ordered point t: the running deviation-from-prefix-mean sum
    * m_t = Σ_{i≤t}(x_i − x̄_i − δ) and the alarm statistic
    * PH_t = m_t − min_{i≤u≤t} m_u, flagged when PH_t > λ — an upward
    * mean shift makes m climb away from its historical minimum.
    * Complements [[cusumDrift]] (known-target CUSUM) with the
    * no-target self-calibrating form. Emits the full (t, ph, alarm)
    * stream so thresholds can be re-read without recompute.
    *
    * Determinism: prefix means divide running int64 sums by the row
    * index (identical operands); the m/min accumulations ride ONE
    * ordered window each, so FP meets in the same order on any
    * engine — the [[graft.operators.Analytics.kaplanMeier]] Σln
    * posture.
    *
    * Scale shape: the [[mannKendall]] bounded-series contract — run
    * on PRE-AGGREGATED buckets; three frames over one group-keyed
    * window sort, zero joins. */
  def pageHinkley(df: DataFrame, groupCol: String, tCol: Column,
                  xCol: Column, delta: Double = 0.0,
                  lambda: Double = 50.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(groupCol).isNotNull && tCol.isNotNull &&
        xCol.isNotNull)
      .select(col(groupCol).as("_g"), tCol.as("_t"),
        xCol.cast("long").as("_x"))
    val w = Window.partitionBy("_g").orderBy("_t")
    val upto = w.rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("_i", row_number().over(w))
      .withColumn("_mean",
        sum("_x").over(upto).cast("double") / col("_i"))
      .withColumn("_m", sum(col("_x").cast("double") - col("_mean") -
        lit(delta)).over(upto))
      .withColumn("ph", round(col("_m") - min("_m").over(upto), 6))
      .select(col("_g").as(groupCol), col("_t").as("t"), col("ph"),
        (col("ph") > lambda).as("alarm"))
  }

  /** Turning-point randomness test per series: count strict local
    * extrema among interior points ((xᵢ−xᵢ₋₁)(xᵢ−xᵢ₊₁) > 0; an i.i.d.
    * series has E[T] = 2(n−2)/3, Var[T] = (16n−29)/90) and report
    * the normal z — the cheap "is this series noise or structure"
    * screen beside [[runsTest]] (runs read signs vs the median;
    * turning points read local shape, catching smooth trends and
    * oscillation the runs count misses). Ties with a neighbor make
    * the product 0 — not an extremum (documented; matches the
    * classical treatment of discrete data).
    *
    * Integer-only until the final z: values arrive quantized (the
    * house contract), the product sign test is int64 arithmetic,
    * T is an exact count. Groups need n ≥ 3.
    *
    * Returns (group, n, n_turning, expected, z).
    *
    * Scale shape: the [[mannKendall]] bounded-series contract — one
    * group-keyed window sort (lag + lead on one frame), one
    * map-side-combinable agg, zero joins. */
  def turningPoints(df: DataFrame, groupCol: String, idxCol: Column,
                    valCol: Column): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && idxCol.isNotNull &&
        valCol.isNotNull)
      .select(col(groupCol).as("_g"), idxCol.as("_i"),
        valCol.cast("long").as("_v"))
    val w = Window.partitionBy("_g").orderBy("_i")
    val tp = base
      .withColumn("_pv", lag("_v", 1).over(w))
      .withColumn("_nv", lead("_v", 1).over(w))
      .groupBy("_g")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_pv").isNotNull && col("_nv").isNotNull &&
          (col("_v") - col("_pv")) * (col("_v") - col("_nv")) > 0,
          1L).otherwise(0L)).as("n_turning"))
      .filter(col("n") >= 3)
    val nD = col("n").cast("double")
    val e = lit(2.0) * (nD - 2.0) / 3.0
    val v = (lit(16.0) * nD - 29.0) / 90.0
    tp.select(col("_g").as(groupCol), col("n"), col("n_turning"),
      round(e, 6).as("expected"),
      round(when(v > 0, (col("n_turning").cast("double") - e) / sqrt(v)),
        6).as("z"))
  }

  /** Granger-causality screen (lag-1) per series pair key: does
    * yesterday's x improve today's y forecast beyond yesterday's y?
    * Restricted OLS y_t ~ 1 + y_{t−1} vs unrestricted
    * y_t ~ 1 + y_{t−1} + x_{t−1}; F = (SSE_r − SSE_u) /
    * (SSE_u/(n−3)) with 1 numerator df — the standard lead/lag
    * attribution read over [[xcorrLag]]'s symmetric correlation (x
    * leading y is exactly what xcorr can't distinguish from y
    * leading x).
    *
    * Determinism: both fits ride exact int64 moment sums over the
    * lagged pairs (values quantized upstream, decimal(38,0) for the
    * quadratics), assembled in one fixed double sequence (Cramer's
    * 3×3 for the unrestricted, the 2×2 closed form for the
    * restricted). NULL F on a singular design, n ≤ 3, or zero
    * unrestricted SSE.
    *
    * Returns (group, n, sse_r, sse_u, f_stat).
    *
    * Scale shape: the [[mannKendall]] bounded-series contract — one
    * group-keyed window sort for the two lags, one
    * map-side-combinable agg of 11 sums, zero joins. */
  def grangerLite(df: DataFrame, groupCol: String, idxCol: Column,
                  xCol: Column, yCol: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(col(groupCol).isNotNull && idxCol.isNotNull &&
        xCol.isNotNull && yCol.isNotNull)
      .select(col(groupCol).as("_g"), idxCol.as("_i"),
        xCol.cast("long").as("_x"), yCol.cast("long").as("_y"))
    val w = Window.partitionBy("_g").orderBy("_i")
    val lagged = base
      .withColumn("_yl", lag("_y", 1).over(w))
      .withColumn("_xl", lag("_x", 1).over(w))
      .filter(col("_yl").isNotNull && col("_xl").isNotNull)
    val m = lagged.groupBy("_g").agg(count(lit(1)).as("_n"),
      sum("_yl").as("_a"), sum("_xl").as("_b"),
      sum(dec(col("_yl")) * col("_yl")).as("_c"),
      sum(dec(col("_yl")) * col("_xl")).as("_d"),
      sum(dec(col("_xl")) * col("_xl")).as("_e"),
      sum("_y").as("_t0"), sum(dec(col("_yl")) * col("_y")).as("_t1"),
      sum(dec(col("_xl")) * col("_y")).as("_t2"),
      sum(dec(col("_y")) * col("_y")).as("_yy"))
    val d = (c: String) => col(c).cast("double")
    val (n, a, b) = (d("_n"), d("_a"), d("_b"))
    val (c3, dd, e) = (d("_c"), d("_d"), d("_e"))
    val (t0, t1, t2, yy) = (d("_t0"), d("_t1"), d("_t2"), d("_yy"))
    // unrestricted: Cramer 3×3 (the Analytics.ols3 formulas inlined —
    // same minors, same order)
    val det = n * (c3 * e - dd * dd) - a * (a * e - dd * b) +
      b * (a * dd - c3 * b)
    val det0 = t0 * (c3 * e - dd * dd) - a * (t1 * e - dd * t2) +
      b * (t1 * dd - c3 * t2)
    val det1 = n * (t1 * e - dd * t2) - t0 * (a * e - dd * b) +
      b * (a * t2 - t1 * b)
    val det2 = n * (c3 * t2 - t1 * dd) - a * (a * t2 - t1 * b) +
      t0 * (a * dd - c3 * b)
    val sseU = when(det =!= 0,
      yy - (det0 / det) * t0 - (det1 / det) * t1 - (det2 / det) * t2)
    // restricted: y ~ 1 + y_lag, 2×2 closed form
    val detR = n * c3 - a * a
    val b1R = when(detR =!= 0, (n * t1 - a * t0) / detR)
    val b0R = when(detR =!= 0, (t0 - b1R * a) / n)
    val sseR = yy - b0R * t0 - b1R * t1
    val f = when(det =!= 0 && detR =!= 0 && n > 3 && sseU > 0,
      (sseR - sseU) / (sseU / (n - 3.0)))
    m.select(col("_g").as(groupCol), col("_n").as("n"),
      round(sseR, 6).as("sse_r"), round(sseU, 6).as("sse_u"),
      round(f, 6).as("f_stat"))
  }

  /** SAX motif mining: z-normalize each series, PAA-average frames
    * of `paa` points, discretize into the 4-symbol alphabet at the
    * standard N(0,1) breakpoints (−0.6745, 0, 0.6745), slide a
    * `word`-frame window — repeated words ACROSS the corpus are the
    * recurring shapes ("ramp then crash", "weekly sawtooth") that
    * no per-series statistic surfaces (Lin et al. 2003's symbolic
    * representation, the standard pre-index for motif/discord
    * mining). Ragged tail frames average their remaining points
    * (standard PAA). Constant series (sd = 0) drop.
    *
    * Determinism: z-scores quantize to int64 ×10⁶ per point, frame
    * means are exact integer folds over them, and the breakpoint
    * compare runs on the exact rational mean — no FP accumulation
    * anywhere. Symbols are totally ordered; the word string is the
    * sort key.
    *
    * Returns (word, n_occurrences, n_series) for words seen at
    * least `minSupport` times.
    *
    * Scale shape: the [[mannKendall]] bounded-series contract (run
    * on pre-aggregated buckets); per series one window sort, one
    * (g, frame) reduced agg, one frame-window lead, one word-keyed
    * count — all map-side-combinable or bounded. */
  def saxMotifs(df: DataFrame, groupCol: String, idxCol: Column,
                valCol: Column, paa: Int = 4, word: Int = 4,
                minSupport: Int = 2): DataFrame = {
    require(paa >= 1 && word >= 2)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(col(groupCol).isNotNull && idxCol.isNotNull &&
        valCol.isNotNull)
      .select(col(groupCol).as("_g"), idxCol.as("_i"),
        valCol.cast("long").as("_v"))
    val mom = base.groupBy("_g").agg(count(lit(1)).as("_n"),
      sum("_v").as("_s"), sum(dec(col("_v")) * col("_v")).as("_q"))
      .filter(col("_n") >= 2 && col("_q") * col("_n") >
        dec(col("_s")) * col("_s"))
    val nD = col("_n").cast("double")
    val mean = col("_s").cast("double") / nD
    val sd = sqrt((col("_q").cast("double") - nD * mean * mean) /
      (nD - 1.0))
    val w = Window.partitionBy("_g").orderBy("_i")
    val zq = base.join(broadcast(mom), Seq("_g"))
      .select(col("_g"),
        floor((col("_v").cast("double") - mean) / sd * 1e6 + lit(0.5))
          .cast("long").as("_zq"),
        (row_number().over(w) - 1).cast("long").as("_rn"))
    val frames = zq.groupBy(col("_g"),
        expr(s"_rn div $paa").as("_f"))
      .agg(sum("_zq").as("_zs"), count(lit(1)).as("_c"))
    val m = col("_zs").cast("double") / col("_c")
    val sym = when(m < -674500.0, "a").when(m < 0.0, "b")
      .when(m < 674500.0, "c").otherwise("d")
    val wf = Window.partitionBy("_g").orderBy("_f")
    val words = frames.withColumn("_sym", sym)
      .select(col("_g"), col("_f"),
        concat((0 until word).map(k =>
          if (k == 0) col("_sym") else lead("_sym", k).over(wf)): _*)
          .as("word"))
      .filter(length(col("word")) === word)
    words.groupBy("word")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("_g")).as("n_series"))
      .filter(col("n_occurrences") >= minSupport)
  }
}
