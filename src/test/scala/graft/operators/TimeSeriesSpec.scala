package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFill: aligned grid, forward fill, at-or-before inclusive") {
    // key 1: obs at 5, 12, 30, step 10 -> grid {10, 20, 30}; the
    // observation exactly ON instant 30 must fill it
    val obs = Seq((1L, 5L, 1.0, 100L), (1L, 12L, 2.0, 101L),
      (1L, 30L, 3.0, 102L)).toDF("k", "us", "v", "id")
    val out = TimeSeries.resampleFill(obs, "k", "us", Seq("v"), 10L, Seq("id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((10L, 1.0), (20L, 2.0), (30L, 3.0)))
  }

  test("resampleFill: equal-instant ties resolve to greatest tiebreak") {
    val obs = Seq((2L, 20L, 5.0, 1L), (2L, 20L, 6.0, 2L))
      .toDF("k", "us", "v", "id")
    val out = TimeSeries.resampleFill(obs, "k", "us", Seq("v"), 10L, Seq("id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((20L, 6.0)))
  }

  test("dateSpine: day count, dow convention, weekend flag, ISO week") {
    val rows = TimeSeries.dateSpine(spark, "2024-01-01", "2024-01-14")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getBoolean(4),
        r.getInt(5)))).toMap
    assert(rows.size == 14)
    assert(rows("2024-01-01") == ((1, false, 1)))  // Monday, ISO week 1
    assert(rows("2024-01-06") == ((6, true, 1)))   // Saturday
    assert(rows("2024-01-07") == ((0, true, 1)))   // Sunday, dow 0
    assert(rows("2024-01-08")._3 == 2)             // ISO week rolls
  }

  test("autocorrelation: ramp +1, alternation -1") {
    import org.apache.spark.sql.functions.col
    val ramp = (1 to 5).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "ts", "v")
    val r = TimeSeries.autocorrelation(ramp, "grp", Seq(col("ts")), "v")
      .collect().head
    assert(r.getDouble(1) == 1.0 && r.getLong(2) == 4L)
    val alt = (1 to 6).map(i => ("g", i.toLong, (i % 2).toDouble))
      .toDF("grp", "ts", "v")
    assert(TimeSeries.autocorrelation(alt, "grp", Seq(col("ts")), "v")
      .collect().head.getDouble(1) == -1.0)
  }

  test("resampleFill: span shorter than a step yields no aligned instants") {
    val obs = Seq((3L, 11L, 1.0, 1L), (3L, 14L, 2.0, 2L))
      .toDF("k", "us", "v", "id")
    assert(TimeSeries.resampleFill(obs, "k", "us", Seq("v"), 10L,
      Seq("id")).isEmpty)
  }

  test("ewmaDyadic: hand-computed dyadic weights; window truncation; key isolation") {
    import org.apache.spark.sql.functions._
    val df = Seq(("A", 1L, 8L), ("A", 2L, 16L), ("A", 3L, 4L),
      ("B", 1L, 100L)).toDF("k", "t", "xq")
    val out = TimeSeries.ewmaDyadic(df, "k", Seq(col("t")), "xq",
        maxWindow = 2, unscale = 1.0)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        r.getDouble(3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6     // operator rounds to 6
    assert(out(("A", 1L)) == 8.0)                    // single obs
    assert(out(("A", 2L)) == r6((8 + 2 * 16) / 3.0)) // (1·8+2·16)/3
    assert(out(("A", 3L)) == r6((16 + 2 * 4) / 3.0)) // window drops t=1
    assert(out(("B", 1L)) == 100.0)                  // keys isolated
  }

  test("mergeIntervals: overlap, touch, gap, containment, per-key isolation") {
    val iv = Seq(
      ("A", 1L, 5L, 1L), ("A", 4L, 8L, 2L),   // overlap -> one island
      ("A", 8L, 9L, 3L),                      // touches 8 -> same island
      ("A", 11L, 12L, 4L),                    // gap -> new island
      ("B", 0L, 100L, 5L), ("B", 10L, 20L, 6L), // contained
      ("C", 7L, 7L, 7L)                       // degenerate point
    ).toDF("k", "s", "e", "id")
    val out = TimeSeries.mergeIntervals(iv, "k", "s", "e", Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(("A", 1L, 9L, 3L), ("A", 11L, 12L, 1L),
      ("B", 0L, 100L, 2L), ("C", 7L, 7L, 1L)))
  }

  test("mergeIntervals: shorter-end row first must not reopen the island") {
    // sorted by start: [0,50], [10,12], [13,14] — running max end
    //  must carry 50 past the short [10,12], keeping one island
    val iv = Seq(("A", 0L, 50L, 1L), ("A", 10L, 12L, 2L),
      ("A", 13L, 14L, 3L)).toDF("k", "s", "e", "id")
    val out = TimeSeries.mergeIntervals(iv, "k", "s", "e", Seq("id"))
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 0L &&
      out(0).getLong(2) == 50L && out(0).getLong(3) == 3L)
  }

  test("mergeIntervals weighted: two-stage incremental merge equals one-shot") {
    // points as [t, t+10] intervals, gap 10; split history at t=35 —
    // the (30,38) pair straddles the split and must still merge
    val pts = Seq(5L, 12L, 30L, 38L, 70L)
    def iv(ts: Seq[Long]) = ts.map(t => ("u", t, t + 10L, 1L))
      .toDF("k", "s", "e", "w")
    val oneShot = TimeSeries.mergeIntervals(iv(pts), "k", "s", "e",
        Seq("e"), Some("w"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val oldSess = TimeSeries.mergeIntervals(iv(pts.filter(_ <= 35)),
        "k", "s", "e", Seq("e"), Some("w"))
      .select(col("k"), col("island_start").as("s"),
        col("island_end").as("e"), col("n_merged").as("w"))
    val incr = TimeSeries.mergeIntervals(
        oldSess.unionByName(iv(pts.filter(_ > 35))), "k", "s", "e",
        Seq("e"), Some("w"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(oneShot == Set((5L, 22L, 2L), (30L, 48L, 2L), (70L, 80L, 1L)))
    assert(incr == oneShot)
  }

  test("decayedCounts: dyadic weights, age cap, exact hand values") {
    // newest day = 10; ages 0, 1, 1, 40(capped to 2 with maxAge=2)
    val df = Seq(("u", 10L), ("u", 9L), ("u", 9L), ("v", -30L))
      .toDF("k", "day")
    val out = TimeSeries.decayedCounts(df, "k", col("day"), maxAge = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    // u: 2^0 + 2^-1 + 2^-1 = 2.0; v: capped 2^-2 = 0.25
    assert(out == Map("u" -> ((2.0, 3L)), "v" -> ((0.25, 1L))))
  }

  test("seasonalDecompose recovers a planted period-4 pattern on a linear trend") {
    // y = 2·t + s[t%4], s = (+5, 0, −5, 0): the ±2-row centered mean
    // of a linear trend is exact, so away from the edges trend ≈ 2t
    // and seasonal ≈ the planted pattern (re-centered, mean 0)
    val s = Seq(5.0, 0.0, -5.0, 0.0)
    val series = (0 until 40).map(t => (t.toLong, 2.0 * t + s(t % 4)))
      .toDF("idx", "v")
    val out = TimeSeries.seasonalDecompose(series, "idx", "v",
        period = 4, halfWindow = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.size == 40)
    // interior rows: trend within the seasonal-bleed tolerance of 2t,
    // seasonal close to planted, residual small
    (10 until 30).foreach { t =>
      val (trend, seasonal, resid) = out(t.toLong)
      assert(math.abs(trend - 2.0 * t) < 1.1, s"t=$t trend=$trend")
      assert(math.abs(seasonal - s(t % 4)) < 1.1, s"t=$t seasonal=$seasonal")
      assert(math.abs(resid) < 2.0, s"t=$t resid=$resid")
    }
    // seasonal component sums to ~0 over one period (re-centered)
    // outputs are round-6: four rounded cells can drift up to 2e-6
    val onePeriod = (12 until 16).map(t => out(t.toLong)._2).sum
    assert(math.abs(onePeriod) < 5e-6, s"period sum $onePeriod")
  }

  test("theilSen: exact slope on a clean line; one wild outlier barely moves it") {
    // clean line y = 2x + 1 over x = 0..9
    val clean = (0 to 9).map(x => ("a", x.toLong, 2.0 * x + 1))
    val out = TimeSeries.theilSen(clean.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).head
    assert(out == (("a", 2.0, 45L)))
    // poison one point: median of pairwise slopes shrugs it off
    val dirty = clean.updated(5, ("a", 5L, 1000.0))
    val rob = TimeSeries.theilSen(dirty.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head.getDouble(1)
    assert(rob == 2.0, s"outlier moved the Theil-Sen slope to $rob")
  }

  test("theilSen: even pair count interpolates; equal-x pairs skipped; groups independent") {
    // group b: points (0,0), (1,1), (2,4) -> slopes 1, 2, 3; median 2
    // group c: duplicate x (two obs at x=0) must not create an
    // infinite slope -- pairs with equal x are skipped
    val df = Seq(("b", 0L, 0.0), ("b", 1L, 1.0), ("b", 2L, 4.0),
      ("c", 0L, 0.0), ("c", 0L, 5.0), ("c", 1L, 2.0)).toDF("g", "x", "y")
    val out = TimeSeries.theilSen(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out("b") == ((2.0, 3L)))
    // c: slopes (0->1): 2.0 and (0'->1): -3.0; interpolated median -0.5
    assert(out("c") == ((-0.5, 2L)))
  }

  // ── interpolateLinear (round 7) ───────────────────────────────────

  test("interpolateLinear: midpoints, exact hits, and the ffill edge") {
    import spark.implicits._
    // obs at t=0 (v=0) and t=10 (v=10); grid step 2 -> straight line;
    // an obs exactly ON a grid instant pins the grid value
    val obs = Seq(("a", 0L, 0.0), ("a", 10L, 10.0), ("b", 3L, 7.0),
      ("b", 9L, 1.0)).toDF("k", "t", "v")
    val out = TimeSeries.interpolateLinear(obs, "k", "t", "v", stepUs = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out(("a", 0L)) == 0.0 && out(("a", 10L)) == 10.0, "exact hits")
    assert(out(("a", 2L)) == 2.0 && out(("a", 4L)) == 4.0 &&
      out(("a", 6L)) == 6.0 && out(("a", 8L)) == 8.0, s"line: $out")
    // b: span [3, 9] -> grid 4, 6, 8 on the 7 -> 1 slope
    assert(out(("b", 4L)) == 6.0 && out(("b", 6L)) == 4.0 &&
      out(("b", 8L)) == 2.0, s"b slope: $out")
    assert(out.size == 9)
  }

  test("interpolateLinear: duplicate-instant ties resolve deterministically") {
    import spark.implicits._
    // two obs at t=0 (v=1 and v=5): prev picks max v (5); next at
    // t=4 has two obs (v=2, v=8): next picks min v (2)
    val obs = Seq(("a", 0L, 1.0), ("a", 0L, 5.0), ("a", 4L, 2.0),
      ("a", 4L, 8.0)).toDF("k", "t", "v")
    val out = TimeSeries.interpolateLinear(obs, "k", "t", "v", stepUs = 2L)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(0L) == 5.0, "grid on duplicate instant takes the last-ordered v")
    assert(out(2L) == 3.5, s"midpoint of (0,5)->(4,2): $out")
  }

  // ── mannKendall / rollingMedian (round 7) ────────────────────────

  test("mannKendall: monotone series hit ±S_max; constant series null z") {
    import spark.implicits._
    // strictly increasing n=5: S = 10, Var = 5*4*15/18,
    // z = 9/sqrt(300/18) = 2.204541
    val d = Seq(("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("up", 4L, 40L), ("up", 5L, 50L),
      ("dn", 1L, 50L), ("dn", 2L, 40L), ("dn", 3L, 30L), ("dn", 4L, 20L),
      ("dn", 5L, 10L),
      ("fl", 1L, 7L), ("fl", 2L, 7L), ("fl", 3L, 7L))
      .toDF("g", "i", "v")
    val m = TimeSeries.mannKendall(d, "g", "i", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("up").getLong(2) == 10L && m("up").getDouble(3) == 2.204541,
      s"up: ${m("up")}")
    assert(m("dn").getLong(2) == -10L && m("dn").getDouble(3) == -2.204541,
      s"dn: ${m("dn")}")
    assert(m("fl").getLong(2) == 0L && m("fl").isNullAt(3),
      s"all-tied variance degenerates: ${m("fl")}")
  }

  test("rollingMedian: warm-up windows, odd/even middles, spike immunity") {
    import spark.implicits._
    val d = Seq(("u", 1L, 1.0), ("u", 2L, 2.0), ("u", 3L, 3.0),
      ("u", 4L, 4.0), ("u", 5L, 5.0),
      // median shrugs at the spike where a mean would jump
      ("v", 1L, 1.0), ("v", 2L, 100.0), ("v", 3L, 2.0)).toDF("k", "i", "v")
    val out = TimeSeries.rollingMedian(d, "k", Seq(col("i")),
        col("v") * 100, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out(("u", 1L)) == ((1L, 1.0)), s"warm-up n=1: $out")
    assert(out(("u", 2L)) == ((2L, 1.5)), s"even window averages: $out")
    assert(out(("u", 3L)) == ((3L, 2.0)) && out(("u", 4L)) == ((3L, 3.0)) &&
      out(("u", 5L)) == ((3L, 4.0)), s"sliding: $out")
    assert(out(("v", 3L)) == ((3L, 2.0)), s"spike-immune: $out")
  }

  test("rollingZscore: exclusive prior baseline, warm-up nulls, spike flagged") {
    import spark.implicits._
    // prior {10,12,14,16,18}: mean 14, sample sd sqrt(10); x=100 ->
    // z = 86/sqrt(10) = 27.195588
    val d = Seq(10L, 12L, 14L, 16L, 18L, 100L).zipWithIndex
      .map { case (v, i) => ("u", i.toLong, v) }.toDF("k", "i", "v")
    val out = TimeSeries.rollingZscore(d, "k", Seq(col("i")), col("v"),
        k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
        r.getBoolean(5))).toMap
    assert(out(0L)._1 == 0L && out(0L)._2.isNaN && !out(0L)._3,
      s"no baseline: $out")
    assert(out(1L)._2.isNaN, s"single-point baseline: $out")
    assert(out(2L) == ((2L, 2.12132, false)), s"two-point baseline: $out")
    assert(out(5L) == ((5L, 27.195588, true)), s"spike: $out")
  }

  test("hampelFilter: spike flagged against rolling median/MAD, all-integer") {
    import spark.implicits._
    // cents 10,12,14,16,100: window 5 at the last row has med 14,
    // MAD 2 -> 2*172 > 3*8 flags the spike; earlier rows stay calm
    val d = Seq((1L, 10L), (2L, 12L), (3L, 14L), (4L, 16L), (5L, 100L))
      .map { case (i, v) => ("u", i, v) }.toDF("k", "i", "v")
    val out = TimeSeries.hampelFilter(d, "k", Seq(col("i")), col("v"),
        k = 5)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(4), r.getBoolean(5))).toMap
    assert(out(5L) == ((0.14, true)), s"spike vs med 14c: $out")
    assert((1L to 4L).forall(!out(_)._2), s"calm prefix unflagged: $out")
  }

  test("xcorrLag: planted 2-step lead found at exactly lag 2") {
    import spark.implicits._
    // y_t = x_{t-2}: x at t correlates y at t+2 perfectly
    val x = Seq(5L, 1L, 7L, 2L, 9L, 3L, 8L, 4L)
    val rows = (0 until 8).map { i =>
      val y = if (i >= 2) x(i - 2) else 11L + i
      (i.toLong, x(i), y)
    }
    val out = TimeSeries.xcorrLag(rows.toDF("i", "x", "y"),
        col("i"), col("x"), col("y"), maxLag = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(out(2L) == 1.0, s"perfect at the planted lag: $out")
    assert(out(0L) < 1.0 && out(1L) < 1.0, s"off-lags imperfect: $out")
  }

  test("rollingCorr: hand-computed window, ±1 extremes, degenerate nulls") {
    import spark.implicits._
    val d = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 3L, 2L),
      (4L, 4L, 4L), (5L, 5L, 5L)).toDF("i", "x", "y")
    val out = TimeSeries.rollingCorr(d, Seq.empty, Seq(col("i")),
        col("x"), col("y"), k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2.isNaN, s"n=1 undefined: $out")
    // rows 1..3: sx=6 sy=6 sxy=13 sxx=14 syy=14 -> 3/sqrt(36) = 0.5
    assert(out(3L) == ((3L, 0.5)), s"hand window: $out")
    // rows 3..5: x=(3,4,5), y=(2,4,5): n*sxy=3*47=141, sx*sy=132,
    // vx=3*50-144=6, vy=3*45-121=14 -> 9/sqrt(84) = 0.981981
    assert(out(5L) == ((3L, 0.981981)), s"trailing window: $out")
    val anti = Seq((1L, 1L, 9L), (2L, 2L, 7L), (3L, 3L, 5L))
      .toDF("i", "x", "y")
    val a = TimeSeries.rollingCorr(anti, Seq.empty, Seq(col("i")),
      col("x"), col("y"), k = 3).collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(a(3L) == -1.0, s"perfect anticorrelation: $a")
    val const = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 5L))
      .toDF("i", "x", "y")
    val c = TimeSeries.rollingCorr(const, Seq.empty, Seq(col("i")),
      col("x"), col("y"), k = 3).collect()
    assert(c.forall(_.isNullAt(4)), "constant y -> undefined everywhere")
  }

  test("seasonalNaiveBacktest: perfect seasonality scores 0, constant series NULLs mase") {
    val cyc = (1L to 9L).map(t => ("g", t, ((t - 1) % 3 + 1) * 10))
      .toDF("grp", "t", "x")
    val out = TimeSeries.seasonalNaiveBacktest(cyc, "grp", col("t"),
        col("x"), season = 3, scale = 1L)
      .collect().head
    // eval rows t=4..9; seasonal lag-3 forecast is exact
    assert(out.getLong(1) == 6 && out.getDouble(2) == 0.0, s"$out")
    // naive |diff| per step: 10,10,20 repeating -> mae 40/3
    assert(out.getDouble(3) == 13.333333, s"$out")
    assert(out.getDouble(4) == 0.0, s"$out")
    val const = (1L to 9L).map(t => ("g", t, 7L)).toDF("grp", "t", "x")
    val c = TimeSeries.seasonalNaiveBacktest(const, "grp", col("t"),
      col("x"), season = 3, scale = 1L).collect().head
    assert(c.getDouble(2) == 0.0 && c.getDouble(3) == 0.0 && c.isNullAt(4),
      s"$c")
  }

  test("outOfOrderAudit: hand-counted late rows; ordered key has NULL max_lag") {
    val rows = Seq(
      ("u", 1L, 10L), ("u", 2L, 20L), ("u", 3L, 15L), // late, lag 5
      ("u", 4L, 30L), ("u", 5L, 5L),                  // late, lag 25
      ("v", 1L, 1L), ("v", 2L, 2L))                   // perfectly ordered
      .toDF("key", "arrival", "ts")
    val out = TimeSeries.outOfOrderAudit(rows, "key", col("arrival"),
        col("ts"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(out("u") == ((5L, 2L, 0.4, Some(25L))), s"$out")
    // max_lag IS the watermark delay that admits every late row
    assert(out("v") == ((2L, 0L, 0.0, None)), s"$out")
    // partitioning must not change arrival order semantics
    val re = TimeSeries.outOfOrderAudit(rows.repartition(5), "key",
        col("arrival"), col("ts"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(re == Map("u" -> 2L, "v" -> 0L), s"$re")
  }

  test("changepoint: planted level shift found; constant series ties to earliest") {
    val step = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 0L),
      ("g", 4L, 10L), ("g", 5L, 10L),
      ("h", 1L, 5L), ("h", 2L, 5L)).toDF("grp", "t", "x")
    val out = TimeSeries.changepoint(step, "grp", col("t"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
         r.getDouble(5), r.getDouble(6))).toMap
    // g: split after t=3 -> means 0 / 10, gain = 0 + 400/2 - 400/5 = 120
    assert(out("g") == ((3L, 3L, 2L, 0.0, 10.0, 120.0)), s"$out")
    // h is constant: every boundary has gain 0 -> earliest t wins
    assert(out("h")._1 == 1L && out("h")._6 == 0.0, s"$out")
    // null t / x rows are dropped, not misordered
    val withNull = Seq(("g", Some(1L), Some(0L)), ("g", None, Some(9L)),
      ("g", Some(2L), None), ("g", Some(3L), Some(8L)))
      .toDF("grp", "t", "x")
    val n = TimeSeries.changepoint(withNull, "grp", col("t"), col("x"))
      .collect().head
    assert(n.getLong(2) + n.getLong(3) == 2L, s"null rows leaked: $n")
  }

  test("heartbeatAvailability: excess-gap downtime; single heartbeat NULL") {
    import org.apache.spark.sql.functions.col
    // gaps 10, 100 at threshold 50: downtime 50 over span 110
    val df = Seq(("g", 0L), ("g", 10L), ("g", 110L), ("solo", 5L))
      .toDF("g", "t")
    val out = TimeSeries.heartbeatAvailability(df, "g", col("t"),
        thresholdNs = 50L)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5)) == ((3L, 110L, 50L, 1L, 100L)), s"$g")
    assert(g.getDouble(6) == 0.545455, s"$g")
    val solo = out("solo")
    assert(solo.getLong(2) == 0L && solo.isNullAt(6), s"$solo")
  }

  test("acfTable: alternating series shows the period-2 signature") {
    import org.apache.spark.sql.functions.col
    // 1,2,1,2,1,2: lag1 = -1 (anti-phase), lag2 = +1 (in phase),
    // lag3 = -1
    val df = (1 to 6).map(i => ("g", i.toLong, if (i % 2 == 1) 1.0 else 2.0))
      .toDF("g", "t", "v")
    val out = TimeSeries.acfTable(df, "g", Seq(col("t")), "v", maxLag = 3)
      .collect().map(r => r.getInt(1) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out(1) == ((-1.0, 5L)), s"$out")
    assert(out(2) == ((1.0, 4L)), s"$out")
    assert(out(3) == ((-1.0, 3L)), s"$out")
  }

  test("ljungBox: hand-computed Q at lags 1..3; degenerate groups null") {
    import org.apache.spark.sql.functions.col
    // a: 3,1,4,1,5,9,2,6 -> rho = (-0.175236, 0.044326, 0.145686),
    // Q = 8*10*(rho1^2/7 + rho2^2/6 + rho3^2/5) = 0.716732
    // c: zero variance (den=0) -> null; s: n=3 <= maxLag -> null
    val rows = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) } ++
      (1 to 5).map(i => ("c", i.toLong, 7L)) ++
      Seq(("s", 1L, 1L), ("s", 2L, 5L), ("s", 3L, 2L))
    val out = TimeSeries.ljungBox(rows.toDF("g", "t", "v"), "g",
        Seq(col("t")), col("v"), maxLag = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 8L && a.getInt(6) == 3)
    assert((a.getDouble(2), a.getDouble(3), a.getDouble(4)) ==
      ((-0.175236, 0.044326, 0.145686)), s"$a")
    assert(a.getDouble(5) == 0.716732, s"$a")
    assert(out("c").isNullAt(5) && out("s").isNullAt(5), s"$out")
    assert(out("c").getLong(1) == 5L && out("s").getLong(1) == 3L)
  }

  test("pacf: Durbin-Levinson closed forms match the hand recursion") {
    import org.apache.spark.sql.functions.col
    // same series as the ljungBox spec: rho = (-0.175236, 0.044326,
    // 0.145686); phi11 = rho1, phi22 = 0.01405, phi33 = 0.160774
    val rows = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) } ++
      (1 to 5).map(i => ("c", i.toLong, 7L))
    val out = TimeSeries.pacf(rows.toDF("g", "t", "v"), "g",
        Seq(col("t")), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert((a.getDouble(2), a.getDouble(3), a.getDouble(4)) ==
      ((-0.175236, 0.044326, 0.145686)), s"$a")
    assert((a.getDouble(5), a.getDouble(6), a.getDouble(7)) ==
      ((-0.175236, 0.01405, 0.160774)), s"$a")
    assert(out("c").isNullAt(5) && out("c").isNullAt(6) &&
      out("c").isNullAt(7), s"${out("c")}")
  }

  test("hurst: modular oscillator anti-persistent, ramp persistent, short null") {
    import org.apache.spark.sql.functions.col
    // o: (i*37) % 101 oscillates -> H = 0.334495 (anti-persistent)
    // r: pure ramp -> H = 1.036233 (persistent)
    // s: n=20 < 32 -> no complete m=16 pair -> null
    val rows =
      (0 until 64).map(i => ("o", i.toLong, ((i * 37) % 101).toLong)) ++
      (0 until 64).map(i => ("r", i.toLong, i.toLong)) ++
      (0 until 20).map(i => ("s", i.toLong, ((i * 37) % 101).toLong))
    val out = TimeSeries.hurst(rows.toDF("g", "t", "v"), "g",
        Seq(col("t")), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("o").getLong(1) == 64L &&
      out("o").getDouble(2) == 0.334495, s"${out("o")}")
    assert(out("r").getDouble(2) == 1.036233, s"${out("r")}")
    assert(out("s").isNullAt(2), s"${out("s")}")
  }

  test("recordsTest: harmonic expectation; ramp maxes the z") {
    import org.apache.spark.sql.functions.col
    // a: 3,1,4,1,5 -> records {3,4,5}, H_5 = 2.283333, z = 0.79156
    // r: pure ramp -> every row a record, z = 3.000565
    val rows = Seq(3L, 1L, 4L, 1L, 5L).zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, v) } ++
      (1 to 5).map(i => ("r", i.toLong, i.toLong))
    val out = TimeSeries.recordsTest(rows.toDF("g", "t", "v"), "g",
        Seq(col("t")), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(2) == 3L &&
      out("a").getDouble(3) == 2.283333 &&
      out("a").getDouble(4) == 0.79156, s"${out("a")}")
    assert(out("r").getLong(2) == 5L &&
      out("r").getDouble(4) == 3.000565, s"${out("r")}")
  }

  test("gumbelFit: hand MoM fit on block maxima; short group null") {
    import org.apache.spark.sql.functions.col
    // maxima (5,8,4,9) at blockSize=2: mu=5.428659, beta=1.85605,
    // rl100=13.966764
    val rows = Seq(1L, 5L, 2L, 8L, 3L, 4L, 9L, 2L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) } ++
      Seq(("s", 1L, 7L))
    val out = TimeSeries.gumbelFit(rows.toDF("g", "t", "v"), "g",
        Seq(col("t")), col("v"), blockSize = 2, returnPeriod = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 4L && a.getDouble(2) == 5.428659 &&
      a.getDouble(3) == 1.85605 && a.getDouble(4) == 13.966764, s"$a")
    assert(!out.contains("s"), s"$out")
  }

  test("siegelSlope: one outlier can't move it where Theil-Sen folds") {
    import org.apache.spark.sql.functions.col
    // (1,1),(2,2),(3,3),(4,100): Siegel 1.0; Theil-Sen would say 17
    val pts = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 100L)).toDF("g", "x", "y")
    val r = TimeSeries.siegelSlope(pts, "g", "x", "y").collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getLong(2) == 4L, s"$r")
    val ts = TimeSeries.theilSen(pts, "g", "x", "y").collect()(0)
    assert(ts.getDouble(1) == 17.0, s"$ts")
  }

  test("runsTest: alternation z>0, clustering z<0, median rows dropped") {
    import org.apache.spark.sql.functions.col
    // a: 5,1,6,2,7,3 (med 4) -> +-+-+- = 6 runs, z = +1.825742
    // b: 1,2,3,7,8,9 (med 5) -> ---+++ = 2 runs, z = -1.825742
    // m: 1,2,3 -> med row dropped, n=2 -> V=0 -> z null
    val rows =
      Seq(5L, 1L, 6L, 2L, 7L, 3L).zipWithIndex.map { case (v, i) =>
        ("a", i.toLong, v) } ++
      Seq(1L, 2L, 3L, 7L, 8L, 9L).zipWithIndex.map { case (v, i) =>
        ("b", i.toLong, v) } ++
      Seq(("m", 1L, 1L), ("m", 2L, 2L), ("m", 3L, 3L))
    val out = TimeSeries.runsTest(rows.toDF("g", "t", "v"), "g",
        Seq(col("t")), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(4) == 6L && out("a").getDouble(5) == 1.825742,
      s"${out("a")}")
    assert(out("b").getLong(4) == 2L && out("b").getDouble(5) == -1.825742,
      s"${out("b")}")
    assert(out("m").getLong(1) == 2L && out("m").isNullAt(5),
      s"${out("m")}")
  }

  test("pageHinkley: upward shift climbs PH; downward shift stays at 0") {
    import org.apache.spark.sql.functions.col
    // flat 10s then 40: i=4 prefix mean 17.5, term 22.5 -> ph 22.5
    val up = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 10L),
      ("g", 4L, 40L)).toDF("g", "t", "x")
    val o = TimeSeries.pageHinkley(up, "g", col("t"), col("x"),
        delta = 0.0, lambda = 5.0)
      .orderBy("t").collect()
    assert(o.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0, 0.0, 22.5), s"${o.toSeq}")
    assert(o.map(_.getBoolean(3)).toSeq == Seq(false, false, false, true))
    // PH-up ignores a downward shift: m's own minimum tracks it
    val down = Seq(("g", 1L, 40L), ("g", 2L, 40L), ("g", 3L, 40L),
      ("g", 4L, 10L)).toDF("g", "t", "x")
    val d = TimeSeries.pageHinkley(down, "g", col("t"), col("x"),
        delta = 0.0, lambda = 5.0)
      .orderBy("t").collect()
    assert(d.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0, 0.0, 0.0), s"${d.toSeq}")
    assert(d.forall(!_.getBoolean(3)))
  }

  test("turningPoints: strict extrema only (ties excluded); pinned z") {
    val s1 = Seq(1L, 3L, 2L, 5L, 4L, 4L, 6L, 2L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }
    val s2 = Seq(5L, 1L, 2L, 3L, 4L, 9L, 2L, 8L, 1L, 7L).zipWithIndex
      .map { case (v, i) => ("b", i.toLong, v) }
    val out = TimeSeries.turningPoints((s1 ++ s2).toDF("g", "i", "v"),
        "g", col("i"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // series a: the 4=4 plateau kills two would-be extrema (product 0)
    assert(out("a") == ((8L, 4L, 4.0, 0.0)), s"$out")
    assert(out("b") == ((10L, 5L, 5.333333, -0.276289)), s"$out")
  }

  test("grangerLite: a leading x drops SSE; short series guards NULL") {
    val x = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val y = Seq(10L, 12L, 21L, 32L, 41L, 52L, 61L, 72L)
    val rows = x.indices.map(i => ("k", i.toLong, x(i), y(i)))
    val out = TimeSeries.grangerLite(rows.toDF("g", "i", "x", "y"),
      "g", col("i"), col("x"), col("y")).head()
    assert(out.getLong(1) == 7L, s"$out")
    assert(out.getDouble(2) == 42.108276 && out.getDouble(3) == 1.591486 &&
      out.getDouble(4) == 101.833866, s"$out")
    // 4 raw rows -> 3 lagged rows -> n > 3 fails -> F null
    val tiny = TimeSeries.grangerLite(
      rows.take(4).toDF("g", "i", "x", "y"),
      "g", col("i"), col("x"), col("y")).head()
    assert(tiny.isNullAt(4), s"$tiny")
  }
  test("saxMotifs: two series sharing a ramp shape form one motif word") {
    val s1 = Seq(1L, 2L, 1L, 2L, 10L, 11L, 10L, 11L, 20L, 21L, 20L, 21L,
      30L, 31L, 30L, 31L)
    val s2 = Seq(100L, 102L, 101L, 99L, 200L, 201L, 199L, 202L, 300L,
      301L, 299L, 300L, 400L, 401L, 399L, 402L)
    val s3 = Seq(5L, 5L, 6L, 5L, 5L, 6L, 5L, 5L, 6L, 5L, 5L, 6L, 5L, 5L,
      5L, 6L)
    val rows = s1.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      s2.zipWithIndex.map { case (v, i) => ("b", i.toLong, v) } ++
      s3.zipWithIndex.map { case (v, i) => ("c", i.toLong, v) }
    val out = TimeSeries.saxMotifs(rows.toDF("g", "i", "v"), "g",
        col("i"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // both ramps z-normalize to the same a->d ladder; the flat series
    // word appears once and is dropped by minSupport
    assert(out.toSeq == Seq(("abcd", 2L, 2L)), s"${out.toSeq}")
  }

}
