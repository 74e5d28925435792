package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: in-order progression; same-ts never advances; window expiry") {
    // u1 completes a->b->c in order; u2 saw b BEFORE a (b must not
    // count); u3 has a and b at the same instant (strictly-after
    // contract); u4's b lands outside the 100-unit conversion window
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 10L, "b"), (2L, 20L, "a"),
      (3L, 10L, "a"), (3L, 10L, "b"),
      (4L, 10L, "a"), (4L, 200L, "b")
    ).toDF("u", "ts", "tpe")
    val out = Analytics.funnel(ev, "u", "ts", "tpe", Seq("a", "b", "c"),
        maxGap = Some(100L))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "a", 4L), (2, "b", 1L), (3, "c", 1L)))
  }

  test("funnel: without a window, any later event advances") {
    val ev = Seq((4L, 10L, "a"), (4L, 200L, "b")).toDF("u", "ts", "tpe")
    val out = Analytics.funnel(ev, "u", "ts", "tpe", Seq("a", "b"))
      .orderBy("step").collect().map(r => r.getLong(2)).toSeq
    assert(out == Seq(1L, 1L))
  }

  test("rollingActiveUsers: trailing-window distinct, range trim, dedup") {
    // period size 10, window 2: u1 active p0,p2; u2 active p0 (twice);
    // max period = 2 so the explode must not report p3
    val ev = Seq((1L, 5L), (1L, 25L), (2L, 3L), (2L, 8L)).toDF("u", "us")
    val out = Analytics.rollingActiveUsers(ev, "u", "us",
        periodUs = 10L, windowPeriods = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p0: {u1,u2}; p1: carried {u1,u2}; p2: {u1}
    assert(out == Set((0L, 2L), (1L, 2L), (2L, 1L)))
  }

  test("rollingActiveUsers: window 1 is plain per-period distinct") {
    val ev = Seq((1L, 5L), (2L, 5L), (1L, 15L)).toDF("u", "us")
    val out = Analytics.rollingActiveUsers(ev, "u", "us", 10L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 2L), (1L, 1L)))
  }

  test("eventTransitions: lagged pairs, row-normalized, null users dropped") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b")
    ).toDF("u", "seq", "tpe")
    val out = Analytics.eventTransitions(ev, "u", "tpe", Seq($"seq"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // a->b three times (p=1.0 from a), b->a once (p=1.0 from b)
    assert(out == Set(("a", "b", 3L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("funnelStepLatency: per-step deltas over converted users only") {
    // u1: a@10 -> b@30 (delta 20); u2: a@10 -> b@50 (delta 40);
    // u3: a only. step-b: n=2, median 30, p90 = 20 + 0.9*20 = 38
    val ev = Seq((1L, 10L, "a"), (1L, 30L, "b"), (2L, 10L, "a"),
      (2L, 50L, "b"), (3L, 10L, "a")).toDF("u", "ts", "tpe")
    val out = Analytics.funnelStepLatency(ev, "u", "ts", "tpe",
        Seq("a", "b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq((2, "b", 2L, 30.0, 38.0)))
  }

  test("funnelStepLatency agrees with funnel's stage populations") {
    val ev = Seq((1L, 10L, "a"), (1L, 30L, "b"), (2L, 10L, "a"),
      (2L, 500L, "b")).toDF("u", "ts", "tpe")
    val lat = Analytics.funnelStepLatency(ev, "u", "ts", "tpe",
        Seq("a", "b"), maxGap = Some(100L))
      .collect().map(r => r.getLong(2)).head
    val fun = Analytics.funnel(ev, "u", "ts", "tpe", Seq("a", "b"),
        maxGap = Some(100L))
      .filter($"step" === 2).collect().map(_.getLong(2)).head
    assert(lat == 1L && fun == 1L)
  }

  test("topPaths: n-gram counts, tiebreak at the cut, per-user isolation") {
    // u1: a b a b -> (a,b,a), (b,a,b); u2: a b c -> (a,b,c);
    // paths never cross users
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c")).toDF("u", "seq", "tpe")
    val out = Analytics.topPaths(ev, "u", "tpe", Seq($"seq"), pathLen = 3,
        topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // all three paths count 1; top-2 by path ascending
    assert(out == Seq(("a", "b", "a", 1L), ("a", "b", "c", 1L)))
  }

  test("sessionBasketLift: hand-computed lift over gap-split sessions") {
    // u1: {a,b} at ts 10,20 then (gap) {a} at 200; u2: {b,c} at 10,20
    // gap 100 -> 3 sessions; c(a)=2 c(b)=2 c(c)=1;
    // (a,b): 1 pair -> 1·3/(2·2) = 0.75; (b,c): 1·3/(2·1) = 1.5
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 200L, 3L, "a"), (2L, 10L, 4L, "b"), (2L, 20L, 5L, "c"))
      .toDF("u", "ts", "eid", "tpe")
    val out = Analytics.sessionBasketLift(ev, "u", "ts",
        Seq($"ts", $"eid"), "tpe", gapUs = 100L)
      .select("t1", "t2", "c12", "lift")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(("a", "b", 1L, 0.75), ("b", "c", 1L, 1.5)))
  }

  test("giniIndex: equality scores 0, single holder scores (n-1)/n") {
    val eq = Seq.tabulate(4)(i => ("g", i.toLong, 1.0)).toDF("grp", "u", "v")
    assert(Analytics.giniIndex(eq, "grp", "u", "v")
      .collect().head.getDouble(2) == 0.0)
    val one = Seq(("g", 1L, 0.0), ("g", 2L, 0.0), ("g", 3L, 0.0),
      ("g", 4L, 10.0)).toDF("grp", "u", "v")
    assert(Analytics.giniIndex(one, "grp", "u", "v")
      .collect().head.getDouble(2) == 0.75)
  }

  test("abLift: hand-computed pooled z on exact counts") {
    // A: 1/4 convert; B: 3/4 -> lift 0.5, pooled p 0.5,
    // z = 0.5 / sqrt(0.25 * 0.5) = 1.41421
    val units = Seq((false, true), (false, false), (false, false),
      (false, false), (true, true), (true, true), (true, true),
      (true, false)).toDF("treat", "conv")
    val r = Analytics.abLift(units, $"treat", $"conv").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 4L, 3L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 1.41421)
  }

  test("audienceOverlap: exact intersection/union/jaccard; disjoint absent") {
    val df = Seq(("s1", 1L), ("s1", 2L), ("s1", 3L), ("s1", 3L),
      ("s2", 2L), ("s2", 3L), ("s2", 4L), ("s3", 9L)).toDF("t", "u")
    val out = Analytics.audienceOverlap(df, "t", "u")
      .collect().map(r => ((r.getString(1), r.getString(0)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // select order is (t2, t1, ...) from the join re-order? read by name instead
    val byName = Analytics.audienceOverlap(df, "t", "u")
      .select("t1", "t2", "n_inter", "n_union", "jaccard")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(byName == Map(("s1", "s2") -> ((2L, 4L, 0.5))))
    assert(out.size == 1) // disjoint pairs (s3) never appear
  }

  test("rfmSegments: hand-computed quintiles over a 5-user fixture") {
    // one purchase each at ts 10..50, value 1..5, period 10:
    // r_days 4..0, f all 1 (key tiebreak), m 1..5
    val p = (1L to 5L).map(u => (u, u * 10L, u.toDouble)).toDF("u", "ts", "v")
    val out = Analytics.rfmSegments(p, "u", "ts", "v", nTiles = 5,
        periodUs = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(4),
        r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    assert(out(1L) == ((4L, 1, 1, 1, "1-1-1")))
    assert(out(5L) == ((0L, 5, 5, 5, "5-5-5")))
    assert(out(3L) == ((2L, 3, 3, 3, "3-3-3")))
  }

  test("linearAttribution: equal split, direct fallback, credit conserved") {
    val ev = Seq(
      (1L, 10L, "ad"), (1L, 15L, "email"), (1L, 20L, "buy"), // 0.5 each
      (2L, 10L, "buy"),                                      // direct
      (3L, 10L, "ad"), (3L, 500L, "buy"),                    // too old -> direct
      (4L, 10L, "ad"), (4L, 20L, "ad"), (4L, 30L, "buy")     // ad 1.0 (2 halves)
    ).toDF("u", "ts", "tpe")
    val out = Analytics.linearAttribution(ev, "u", "ts", "tpe",
        conversion = "buy", lookbackUs = 100L)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("ad", 1.5), ("email", 0.5), ("direct", 2.0)))
    // credit conservation: totals equal the 4 conversions
    assert(out.toSeq.map(_._2).sum == 4.0)
  }

  test("lastTouchAttribution: credit, direct fallback, lookback expiry") {
    val ev = Seq(
      (1L, 10L, "ad"), (1L, 20L, "buy"),          // credited to ad
      (2L, 10L, "buy"),                           // no touch -> direct
      (3L, 10L, "ad"), (3L, 500L, "buy"),         // touch too old -> direct
      (4L, 10L, "ad"), (4L, 15L, "email"), (4L, 20L, "buy"), // latest wins
      (5L, 10L, "buy"), (5L, 20L, "buy")          // conversion is never a touch
    ).toDF("u", "ts", "tpe")
    val out = Analytics.lastTouchAttribution(ev, "u", "ts", "tpe",
        conversion = "buy", orderCols = Seq($"ts"), lookback = Some(100L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("ad", 1L), ("email", 1L), ("direct", 4L)))
  }

  test("groupedLinearFit: exact fit on a known line; null rows excluded") {
    // group g: y = 2x + 3 exactly -> slope 2, intercept 3, r2 1
    val df = Seq(("g", Option(1.0), Option(5.0)), ("g", Option(2.0), Option(7.0)),
      ("g", Option(3.0), Option(9.0)), ("g", Option.empty[Double], Option(1.0)),
      ("g", Option(9.0), Option.empty[Double])).toDF("grp", "x", "y")
    val out = Analytics.groupedLinearFit(df, Seq("grp"), $"x", $"y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(out == Seq(("g", 2.0, 3.0, 1.0, 3L)))
  }

  test("cohortRetention: first-period cohorts, offsets, in-cell dedup") {
    // period size 10: u1 cohort 0 active at offsets {0,1,3}; u2
    // cohort 1 at {0,1}; u3 cohort 0, two events in the SAME cell
    val ev = Seq((1L, 5L), (1L, 15L), (1L, 35L), (2L, 12L), (2L, 22L),
      (3L, 5L), (3L, 7L)).toDF("u", "us")
    val out = Analytics.cohortRetention(ev, "u", "us", periodUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("skyline2D: frontier, duplicates kept, equal-coordinate domination") {
    val pts = Seq(
      ("g", 1L, 1.0, 5.0, "a"),   // frontier
      ("g", 2L, 2.0, 3.0, "b"),   // frontier
      ("g", 3L, 2.0, 3.0, "c"),   // duplicate of b -> kept
      ("g", 4L, 2.0, 4.0, "d"),   // dominated by b (same x, worse y)
      ("g", 5L, 3.0, 3.0, "e"),   // dominated by b (worse x, same y)
      ("g", 6L, 4.0, 1.0, "f"),   // frontier
      ("g", 7L, 5.0, 2.0, "h"),   // dominated by f
      ("h2", 8L, 9.0, 9.0, "i")   // alone in its group -> frontier
    ).toDF("grp", "id", "x", "y", "tag")
    val got = Analytics.skyline2D(pts, Seq("grp"), "x", "y")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L, 2L, 3L, 6L, 8L))
  }

  test("skyline2D equals brute-force domination on a random cloud") {
    val rng = new scala.util.Random(11)
    val pts = (0 until 200).map(i =>
      (i.toLong, rng.nextInt(40).toDouble, rng.nextInt(40).toDouble))
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._1).toSet
    val got = Analytics.skyline2D(pts.toDF("id", "x", "y"),
        Seq.empty, "x", "y")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("targetEncodeOOF: hand-computed encodings; own fold excluded") {
    // (cat, fold, target): A sees 10,20 in fold 0 and 30 in fold 1;
    // B sees 40 in fold 1 only
    val rows = Seq(("A", 0L, 10L), ("A", 0L, 20L), ("A", 1L, 30L),
      ("B", 1L, 40L)).toDF("cat", "fold", "tq")
    val enc = Analytics.targetEncodeOOF(rows, "cat", "fold", col("tq"),
        smoothing = 2L, unscale = 1.0)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toMap
    // prior_0 = (100-30)/2 = 35; prior_1 = (100-70)/2 = 15
    assert(enc(("A", 0L)) == math.rint(100e6 / 3) / 1e6) // (30+70)/3
    assert(enc(("A", 1L)) == 15.0)                       // (30+30)/4
    // B entirely inside fold 1 -> encodes to exactly prior_1
    assert(enc(("B", 1L)) == 15.0)
    assert(enc.size == 3)
  }

  test("targetEncodeOOF: encoding never sees its own fold's targets") {
    // poison fold 0 of cat A with a huge target; enc(A, 0) must not move
    val base = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 0L, 999999L),
      ("B", 0L, 10L), ("B", 1L, 10L), ("B", 2L, 10L))
      .toDF("cat", "fold", "tq")
    val e0 = Analytics.targetEncodeOOF(base, "cat", "fold", col("tq"),
        2L, 1.0)
      .filter(col("cat") === "A" && col("fold") === 0L)
      .head().getDouble(2)
    // out-of-fold mean of A is (10+20)/2; priors exclude fold 0 too
    val prior0 = (10.0 + 20.0 + 10.0 + 10.0) / 4
    assert(math.abs(e0 - (30.0 + 2 * prior0) / 4) < 1e-12)
  }

  test("weightedMedian: lower median by running mass, per-group isolation") {
    // group A masses: 10@w1, 20@w2, 30@w1 → total 4, half-mass 2
    //   cum at 10 is 1 (1·2 < 4), at 20 is 3 (3·2 ≥ 4) → median 20
    // group B: 5@w9, 100@w1 → cum at 5 is 9 (18 ≥ 10) → median 5
    val df = Seq(
      ("A", 10.0, 1L, 1L), ("A", 20.0, 2L, 2L), ("A", 30.0, 1L, 3L),
      ("B", 5.0, 9L, 4L), ("B", 100.0, 1L, 5L)).toDF("g", "v", "w", "id")
    val out = Analytics.weightedMedian(df, "g", "v", "w", Seq("id"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(out == Map("A" -> ((20.0, 4L)), "B" -> ((5.0, 10L))))
  }

  test("weightedMedian: all-equal weights degrade to the plain lower median") {
    val df = (1 to 6).map(i => ("g", i.toDouble, 1L, i.toLong))
      .toDF("g", "v", "w", "id")
    // even count, lower median = 3 (cum 3·2 ≥ 6)
    assert(Analytics.weightedMedian(df, "g", "v", "w", Seq("id"))
      .head().getDouble(1) == 3.0)
  }

  test("kaplanMeier: hand-computed product-limit with censoring") {
    // group A: t=1 event (n=4), t=2 censored (n=3), t=3 event (n=2)
    //   S(1) = 3/4; S(2) = 3/4 (censor only); S(3) = 3/4 * 1/2 = 3/8
    val df = Seq(("A", 1L, true), ("A", 2L, false), ("A", 3L, true),
      ("A", 3L, false)).toDF("g", "t", "obs")
    val out = Analytics.kaplanMeier(df, "g", "t", col("obs"))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((4L, 1L, 0.75)))
    assert(out(2L) == ((3L, 0L, 0.75)))
    assert(out(3L) == ((2L, 1L, 0.375)))
  }

  test("kaplanMeier: risk-set extinction pins S=0 without evaluating ln(0)") {
    // t=1: 1 of 2 dies; t=2: the last one dies -> d=n -> S=0 exactly
    val df = Seq(("g", 1L, true), ("g", 2L, true)).toDF("g", "t", "obs")
    val out = Analytics.kaplanMeier(df, "g", "t", col("obs"))
      .orderBy("t").collect()
    assert(out.map(_.getDouble(4)).toSeq == Seq(0.5, 0.0))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L))
  }

  test("aucByGroup: hand-computed with ties scoring half") {
    // pos at scores {3,2}, neg at {1,2}: pairwise 1+1+1+0.5 of 4 = 0.875
    val df = Seq(("g", 3L, true), ("g", 2L, true), ("g", 1L, false),
      ("g", 2L, false)).toDF("g", "s", "y")
    val out = Analytics.aucByGroup(df, "g", col("s"), col("y")).head()
    assert((out.getLong(1), out.getLong(2), out.getDouble(3)) ==
      ((2L, 2L, 0.875)))
  }

  test("aucByGroup: perfect separation is 1, reversed is 0, one-class dropped") {
    val df = Seq(("sep", 10L, true), ("sep", 11L, true),
      ("sep", 1L, false), ("sep", 2L, false),
      ("rev", 1L, true), ("rev", 9L, false),
      ("only", 5L, true)).toDF("g", "s", "y")
    val by = Analytics.aucByGroup(df, "g", col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(by == Map("sep" -> 1.0, "rev" -> 0.0))
  }

  test("kaplanMeier: groups are independent; all-censored curve stays at 1") {
    val df = Seq(("a", 1L, true), ("b", 1L, false), ("b", 2L, false))
      .toDF("g", "t", "obs")
    val by = Analytics.kaplanMeier(df, "g", "t", col("obs"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    assert(by(("a", 1L)) == 0.0)        // sole member dies -> extinct
    assert(by(("b", 1L)) == 1.0 && by(("b", 2L)) == 1.0)
  }

  // ── bootstrapCI (round 7) ─────────────────────────────────────────

  test("bootstrapCI: ordered interval, constant data collapses to the mean") {
    import spark.implicits._
    val const = (1L to 200L).map(i => ("a", i, 5.0)).toDF("g", "id", "v")
    val r = Analytics.bootstrapCI(const, "g", "id", "v").collect().head
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0 &&
      r.getDouble(3) == 5.0, s"constant data must give a point interval: $r")
    val varied = (1L to 500L).map(i => ("a", i, (i % 50).toDouble))
      .toDF("g", "id", "v")
    val v = Analytics.bootstrapCI(varied, "g", "id", "v").collect().head
    assert(v.getDouble(2) <= v.getDouble(1) && v.getDouble(1) <= v.getDouble(3),
      s"est inside [lo, hi]: $v")
    assert(v.getDouble(2) < v.getDouble(3), "varied data has interval width")
  }

  test("bootstrapCI: invariant to partitioning (md5-seeded replicates)") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (s"g${i % 2}", i, (i % 17).toDouble))
      .toDF("g", "id", "v")
    val a = Analytics.bootstrapCI(d, "g", "id", "v")
      .collect().map(_.toString).sorted.toSeq
    val b = Analytics.bootstrapCI(d.repartition(11), "g", "id", "v")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.size == 2)
  }

  test("mannWhitneyU: textbook no-tie U and z; all-tied z null") {
    import spark.implicits._
    // A={1,2,5}, B={3,4}: ranks 1..5, R_A=8 -> U_A=2, U_B=4;
    // z = (2-3)/sqrt(3) = -0.57735
    val d = Seq((true, 1L), (true, 2L), (true, 5L), (false, 3L),
      (false, 4L)).toDF("a", "v")
    val r = Analytics.mannWhitneyU(d, col("a"), col("v")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2, s"$r")
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0, s"$r")
    assert(r.getDouble(4) == -0.57735, s"$r")
    // every score identical: tie correction kills the variance -> z
    // null; average ranks still give U_A = n_a*n_b/2
    val tied = Seq((true, 5L), (true, 5L), (false, 5L)).toDF("a", "v")
    val t = Analytics.mannWhitneyU(tied, col("a"), col("v")).collect().head
    assert(t.getDouble(2) == 1.0 && t.getDouble(3) == 1.0 && t.isNullAt(4),
      s"tied: $t")
  }

  test("wilcoxonSignedRank: textbook W+; zeros dropped; tied |d|") {
    import spark.implicits._
    // d={1,-2,3,-4,5}: W+ = 1+3+5 = 9, mu=7.5, sig2=13.75,
    // z = 1.5/sqrt(13.75) = 0.40452; a 0 diff is dropped (n stays 5)
    val d = Seq(1L, -2L, 3L, -4L, 5L, 0L).toDF("d")
    val r = Analytics.wilcoxonSignedRank(d, col("d")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 5, s"$r")
    assert(r.getDouble(3) == 9.0 && r.getDouble(4) == 0.40452, s"$r")
    // all |d| tied at 2: avg rank 2, W+ = 4, sig2 = 3.5-0.5 = 3 ->
    // z = 1/sqrt(3)
    val t = Analytics.wilcoxonSignedRank(Seq(2L, -2L, 2L).toDF("d"),
      col("d")).collect().head
    assert(t.getDouble(3) == 4.0 && t.getDouble(4) == 0.57735, s"tied: $t")
  }

  // ── kruskalWallis / spearman / anovaF (round 7) ──────────────────

  test("kruskalWallis: textbook no-tie H; all-tied scores give null h_tie") {
    import spark.implicits._
    // A={1,2}, B={3,4}: ranks 1..4, R_A=3, R_B=7 ->
    // H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4; no ties -> h_tie = h
    val d = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r = Analytics.kruskalWallis(d, "g", col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 2.4 && r.getDouble(3) == 2.4, s"H: $r")
    // every score identical: zero rank variance -> H = 0, correction
    // degenerates -> h_tie null
    val tied = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val t = Analytics.kruskalWallis(tied, "g", col("v")).collect().head
    assert(t.getDouble(2) == 0.0 && t.isNullAt(3), s"tied: $t")
  }

  test("kruskalWallis: invariant to partitioning") {
    import spark.implicits._
    val d = (1L to 400L).map(i => (s"g${i % 3}", i % 23)).toDF("g", "v")
    val a = Analytics.kruskalWallis(d, "g", col("v")).collect().head
    val b = Analytics.kruskalWallis(d.repartition(13), "g", col("v"))
      .collect().head
    assert(a.toString == b.toString)
  }

  test("spearman: monotone=1, inverse=-1, textbook 0.8, constant null") {
    import spark.implicits._
    val d = Seq(
      // monotone but non-linear: rho must still be exactly 1
      ("up", 1.0, 1L), ("up", 2.0, 4L), ("up", 3.0, 9L), ("up", 4.0, 100L),
      ("dn", 1.0, 9L), ("dn", 2.0, 7L), ("dn", 3.0, 5L), ("dn", 4.0, 1L),
      // classic d^2=2 example: 1 - 6*2/(4*15) = 0.8
      ("tx", 1.0, 1L), ("tx", 2.0, 3L), ("tx", 3.0, 2L), ("tx", 4.0, 4L),
      // zero variance in x -> undefined
      ("cx", 7.0, 1L), ("cx", 7.0, 2L), ("cx", 7.0, 3L))
      .toDF("g", "x", "y")
    val m = Analytics.spearmanByGroup(d, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("up").getDouble(2) == 1.0, s"monotone: ${m("up")}")
    assert(m("dn").getDouble(2) == -1.0, s"inverse: ${m("dn")}")
    assert(m("tx").getDouble(2) == 0.8, s"textbook: ${m("tx")}")
    assert(m("cx").isNullAt(2), s"constant x: ${m("cx")}")
  }

  test("spearman: tied ranks average (half-integer ranks stay exact)") {
    import spark.implicits._
    // x ties at 2.0 share rank 2.5; y strictly increasing
    val d = Seq(("g", 1.0, 1L), ("g", 2.0, 2L), ("g", 2.0, 3L),
      ("g", 3.0, 4L)).toDF("g", "x", "y")
    val r = Analytics.spearmanByGroup(d, "g", col("x"), col("y"))
      .collect().head
    // rx2 = (2,5,5,8), ry2 = (2,4,6,8): rho = 0.948683
    assert(r.getDouble(2) == 0.948683, s"tied: $r")
  }

  test("anovaF: hand-computed SS decomposition and F; equal means give F=0") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Analytics.anovaF(d, "g", col("v")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 13.5, s"ss_between: $r")
    assert(r.getDouble(3) == 4.0, s"ss_within: $r")
    assert(r.getDouble(4) == 13.5, s"F = (13.5/1)/(4/4): $r")
    assert(r.getDouble(5) == 0.771429, s"eta^2 = 13.5/17.5: $r")
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    val f = Analytics.anovaF(flat, "g", col("v")).collect().head
    assert(f.getDouble(2) == 0.0 && f.getDouble(4) == 0.0, s"flat: $f")
  }

  test("permutationTest: identical groups p=1; separated groups small p") {
    import spark.implicits._
    val same = (1L to 20L).map(i => (i, i % 2 == 0, (i % 5) * 10))
      .toDF("id", "a", "v")
    val s = Analytics.permutationTest(same, col("a"), col("v"), col("id"))
      .collect().head
    assert(s.getLong(0) == 10L && s.getLong(1) == 10L)
    assert(s.getDouble(3) > 0.3, s"no real effect -> large p: $s")
    // complete separation: A=10s, B=0s -> T_obs = 10, few permutations reach it
    val sep = Seq((1L, true, 10L), (2L, true, 10L), (3L, true, 10L),
      (4L, false, 0L), (5L, false, 0L), (6L, false, 0L)).toDF("id", "a", "v")
    val r = Analytics.permutationTest(sep, col("a"), col("v"), col("id"))
      .collect().head
    assert(r.getDouble(2) == 10.0, s"t_obs: $r")
    assert(r.getDouble(3) < 0.3 && r.getDouble(3) > 0.0, s"p: $r")
  }

  test("permutationTest: md5-seeded p-value invariant to partitioning") {
    import spark.implicits._
    val d = (1L to 30L).map(i => (i, i <= 15, i * 3 % 40)).toDF("id", "a", "v")
    val x = Analytics.permutationTest(d, col("a"), col("v"), col("id"))
      .collect().head.toString
    val y = Analytics.permutationTest(d.repartition(7), col("a"), col("v"),
      col("id")).collect().head.toString
    assert(x == y)
  }

  test("activityStreaks: islands, duplicates collapse, last vs longest") {
    import spark.implicits._
    // u: days {1,2,3, 7,8, 10} -> longest 3, last streak 1
    val d = Seq(("u", 1L), ("u", 2L), ("u", 2L), ("u", 3L), ("u", 7L),
      ("u", 8L), ("u", 10L),
      // w: one unbroken run whose last streak IS the longest
      ("w", 4L), ("w", 5L), ("w", 6L)).toDF("k", "day")
    val out = Analytics.activityStreaks(d, "k", col("day"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("u") == ((6L, 3L, 3L, 1L)), s"u: $out")
    assert(out("w") == ((3L, 1L, 3L, 3L)), s"w: $out")
  }

  test("trimmedMean: outliers cut by integer rank, small groups untouched") {
    import spark.implicits._
    // g: 1..9 + outlier 1000 -> n=10, t=1: mean of 2..9 = 5.5
    val rows = ((1 to 9).map(v => ("g", v.toLong, v.toDouble)) :+
      (("g", 10L, 1000.0))) ++
      // h: n=5 -> t = 5*10 div 100 = 0, plain mean of 1..5 = 3
      (1 to 5).map(v => ("h", v.toLong, v.toDouble))
    val out = Analytics.trimmedMean(rows.toDF("g", "id", "v"), "g",
        col("v"), Seq(col("id")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("g") == ((10L, 8L, 5.5)), s"trimmed: $out")
    assert(out("h") == ((5L, 5L, 3.0)), s"small group keeps all: $out")
  }

  test("stationaryDist: hand-iterated chain, absorbing dangling state") {
    import spark.implicits._
    // a->a, a->b, b->a: v0=(.5,.5) -> (.75,.25) -> (.625,.375) ->
    // (.6875,.3125); all dyadic, exact under 1e9 quantization
    val t = Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 1L))
      .toDF("s", "d", "n")
    val out = Analytics.stationaryDist(t, "s", "d", "n")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.6875 && out("b") == 0.3125, s"chain: $out")
    // b absorbs: a sends everything to b, b keeps its mass (no out)
    val abs = Seq(("a", "b", 2L)).toDF("s", "d", "n")
    val o2 = Analytics.stationaryDist(abs, "s", "d", "n")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(o2("a") == 0.0 && o2("b") == 1.0, s"absorbing: $o2")
  }

  test("hierarchicalShares: child-of-parent and parent-of-total in one pass") {
    import spark.implicits._
    val d = Seq(("P", "a", 3000L), ("P", "b", 1000L), ("Q", "c", 6000L))
      .toDF("p", "c", "cents")
    val out = Analytics.hierarchicalShares(d, "p", "c", col("cents"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(("P", "a")) == ((30.0, 0.75, 0.4)), s"P/a: $out")
    assert(out(("P", "b")) == ((10.0, 0.25, 0.4)), s"P/b: $out")
    assert(out(("Q", "c")) == ((60.0, 1.0, 0.6)), s"Q/c: $out")
  }

  test("kneeDetection: obvious elbow found with normalized chord distance") {
    import spark.implicits._
    // (0,0) (1,9) (2,10): normalized d = (0, .9-.5, 0) -> knee (1, 9)
    val c = Seq((0L, 0L), (1L, 9L), (2L, 10L)).toDF("x", "y")
    val r = Analytics.kneeDetection(c, col("x"), col("y")).collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 9.0 &&
      r.getDouble(2) == 0.4, s"knee: $r")
  }

  test("diffInDiff: hand-computed 2x2; empty cell nulls the estimate") {
    import spark.implicits._
    val rows = Seq(
      (true, false, 1.0), (true, false, 1.0),   // T pre mean 1
      (true, true, 3.0), (true, true, 3.0),     // T post mean 3
      (false, false, 2.0), (false, false, 2.0), // C pre mean 2
      (false, true, 2.0), (false, true, 3.0))   // C post mean 2.5
      .toDF("t", "p", "v")
    val r = Analytics.diffInDiff(rows, col("t"), col("p"), col("v"))
      .collect().head
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3)) == ((1.0, 3.0, 2.0, 2.5)), s"cells: $r")
    assert(r.getDouble(4) == 1.5, s"DiD = (3-1)-(2.5-2): $r")
    val missing = rows.filter(!(col("t") && !col("p")))
    val m = Analytics.diffInDiff(missing, col("t"), col("p"), col("v"))
      .collect().head
    assert(m.isNullAt(4), "empty treat-pre cell nulls DiD")
  }

  test("cuped: perfectly predictive covariate flattens the metric") {
    import spark.implicits._
    // post y = 2 * pre x exactly -> theta = 2, y_adj = 2*xbar for all
    val pre = (1 to 4).map(u => (u.toLong, u.toDouble)).toDF("k", "v")
    val post = (1 to 4).map(u => (u.toLong, 2.0 * u)).toDF("k", "v")
    val out = Analytics.cuped(pre, post, "k", col("v"), col("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.values.forall(v => v._2 == 5.0 && v._3 == 2.0),
      s"y_adj constant at 2*xbar, theta 2: $out")
    assert(out(3L)._1 == 6.0, s"raw y preserved: $out")
    // constant pre-metric: nothing to regress on
    val flat = (1 to 4).map(u => (u.toLong, 7.0)).toDF("k", "v")
    val f = Analytics.cuped(flat, post, "k", col("v"), col("v")).collect()
    assert(f.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("simpsonFlip: every stratum favors B yet the aggregate favors A") {
    import spark.implicits._
    // s1: A 9/10 vs B 1/1; s2: A 0/1 vs B 2/10 -> B wins both strata;
    // aggregate: A 9/11 = .818 vs B 3/11 = .273 -> A wins. Classic.
    val rows =
      (1 to 9).map(_ => ("s1", true, true)) ++ Seq(("s1", true, false)) ++
      Seq(("s1", false, true)) ++
      Seq(("s2", true, false)) ++
      (1 to 2).map(_ => ("s2", false, true)) ++
      (1 to 8).map(_ => ("s2", false, false))
    val out = Analytics.simpsonFlip(rows.toDF("st", "a", "y"), "st",
        col("a"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6))).toMap
    assert(out("s1") == ((0.9, 1.0, -0.1, 0.545455, true)), s"s1: $out")
    assert(out("s2") == ((0.0, 0.2, -0.2, 0.545455, true)), s"s2: $out")
  }

  test("exactPercentilesBy: integer ceiling ranks on 1..10; singleton group") {
    import spark.implicits._
    val d = ((1 to 10).map(v => ("g", v.toLong, v.toDouble)) :+
      (("s", 99L, 7.0))).toDF("g", "id", "v")
    val out = Analytics.exactPercentilesBy(d, "g", col("v"), Seq(col("id")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // ranks ceil(10p/100) = 1, 5, 9
    assert(out("g") == ((10L, 1.0, 5.0, 9.0)), s"deciles: $out")
    assert(out("s") == ((1L, 7.0, 7.0, 7.0)), s"singleton: $out")
  }

  test("behavioralEntropy: uniform=1, single-category canonical 0, top share") {
    import spark.implicits._
    val d = Seq(("u", "a"), ("u", "b"), ("u", "a"), ("u", "b"),
      ("v", "a"), ("v", "a"), ("v", "a"),
      ("w", "a"), ("w", "a"), ("w", "b"), ("w", "c")).toDF("k", "c")
    val out = Analytics.behavioralEntropy(d, "k", "c")
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("u")
    assert(u.getLong(1) == 4 && u.getLong(2) == 2 &&
      u.getDouble(3) == 0.693147 && u.getDouble(4) == 1.0 &&
      u.getDouble(5) == 0.5, s"uniform 2-cat: $u")
    val v = out("v")
    assert(v.getDouble(3) == 0.0 &&
      java.lang.Double.doubleToRawLongBits(v.getDouble(3)) == 0L,
      s"single-category entropy is CANONICAL +0.0: $v")
    assert(v.isNullAt(4) && v.getDouble(5) == 1.0, s"one-trick user: $v")
    // w: counts (2,1,1)/4: H = -(0.5 ln .5 + 0.25 ln .25 * 2) = 1.039721
    assert(out("w").getDouble(3) == 1.039721 &&
      out("w").getDouble(5) == 0.5, s"mixed: ${out("w")}")
  }

  test("olsFitApply: exact planted plane recovered; singular fit nulls") {
    import spark.implicits._
    // y = 2 + 3*x1 + 5*x2 exactly on 4 independent points
    val fit = Seq((1L, 0.0, 0.0, 2.0), (2L, 1.0, 0.0, 5.0),
      (3L, 0.0, 1.0, 7.0), (4L, 2.0, 1.0, 13.0)).toDF("id", "x1", "x2", "y")
    val apply = Seq((10L, 3.0, 2.0, 21.0), (11L, 1.0, 1.0, 11.0))
      .toDF("id", "x1", "x2", "y")
    val out = Analytics.olsFitApply(fit, apply, col("y"), col("x1"),
        col("x2"), Seq(col("id")))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(10L) == ((21.0, 21.0, 0.0)), s"on-plane point: $out")
    // (1,1) -> 2+3+5 = 10, y=11 -> resid 1
    assert(out(11L) == ((11.0, 10.0, 1.0)), s"off-plane resid: $out")
    // collinear features (x2 = x1): singular system -> null pred
    val sing = Seq((1L, 1.0, 1.0, 2.0), (2L, 2.0, 2.0, 4.0),
      (3L, 3.0, 3.0, 6.0)).toDF("id", "x1", "x2", "y")
    val s2 = Analytics.olsFitApply(sing, apply, col("y"), col("x1"),
      col("x2"), Seq(col("id"))).collect()
    assert(s2.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      "singular normal equations must yield null predictions")
  }

  test("anom: outer groups flagged against hand limits") {
    import spark.implicits._
    // means 2/5/8 around grand 5, s2=1, half = 1.214338: a and c flag
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(4L, 5L, 6L).map(("b", _)) ++
      Seq(7L, 8L, 9L).map(("c", _))).toDF("g", "v")
    val out = Analytics.anom(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(4) == 3.785662 &&
      out("a").getDouble(5) == 6.214338, s"${out("a")}")
    assert(out("a").getBoolean(6) && out("c").getBoolean(6) &&
      !out("b").getBoolean(6), s"$out")
  }

  test("ansariBradley: wide sample scores low; hand z on folded ranks") {
    import spark.implicits._
    // a = {1,10} wide, b = {5,6} narrow: W_a = 2, z = -1.732051
    val df = Seq((true, 1L), (true, 10L), (false, 5L), (false, 6L))
      .toDF("a", "v")
    val r = Analytics.ansariBradley(df, col("a"), col("v")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L &&
      r.getDouble(2) == 2.0 && r.getDouble(3) == -1.732051, s"$r")
  }

  test("pageTrend: perfect rise hits the max L; incomplete excluded") {
    import spark.implicits._
    // 3 blocks, each strictly rising across t1<t2<t3: L = 42, z = 2.44949
    val cells = (1L to 3L).flatMap(b => Seq(
      (b, 1L, b * 10), (b, 2L, b * 10 + 1), (b, 3L, b * 10 + 2))) ++
      Seq((9L, 1L, 5L))  // incomplete block
    val r = Analytics.pageTrend(cells.toDF("b", "t", "v"), "b", "t",
      col("v")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L &&
      r.getDouble(2) == 42.0 && r.getDouble(3) == 2.44949, s"$r")
  }

  test("grubbs: the planted whale identified; constant group null") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L), ("a", 5L, 100L),
      ("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L)).toDF("g", "id", "v")
    val out = Analytics.grubbs(df, "g", col("id"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 5L && a.getLong(2) == 5L &&
      a.getLong(3) == 100L && a.getDouble(4) == 1.788267, s"$a")
    assert(out("c").isNullAt(4), s"${out("c")}")
  }

  test("cliffsDelta: full separation is 1/large; identical is 0/negligible") {
    import spark.implicits._
    val sep = Seq((true, 3L), (true, 4L), (false, 1L), (false, 2L))
      .toDF("a", "v")
    val r = Analytics.cliffsDelta(sep, col("a"), col("v")).collect()(0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
      r.getString(4) == "large", s"$r")
    val same = Seq((true, 1L), (true, 2L), (false, 1L), (false, 2L))
      .toDF("a", "v")
    val r2 = Analytics.cliffsDelta(same, col("a"), col("v")).collect()(0)
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.5 &&
      r2.getString(4) == "negligible", s"$r2")
  }

  test("moodsMedianTest: separated halves give chi2 8; identical gives 0") {
    import spark.implicits._
    // a all below pooled median, b all above: chi2 = 8 on 2 groups of 4
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(5L, 6L, 7L, 8L).map(("b", _))).toDF("g", "v")
    val r = Analytics.moodsMedianTest(df, "g", col("v")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 8L &&
      r.getLong(2) == 4L && r.getDouble(3) == 8.0 &&
      r.getLong(4) == 1L, s"$r")
    // identical groups: chi2 0
    val same = (Seq(1L, 2L).map(("a", _)) ++ Seq(1L, 2L).map(("b", _)))
      .toDF("g", "v")
    assert(Analytics.moodsMedianTest(same, "g", col("v"))
      .collect()(0).getDouble(3) == 0.0)
  }

  test("qqFit: exact affine relation recovered from deciles") {
    import spark.implicits._
    // b = 2a + 5 exactly: slope 2, intercept 5, r = 1
    val a = (1L to 20L)
    val df = (a.map((true, _)) ++ a.map(v => (false, 2 * v + 5)))
      .toDF("g", "v")
    val r = Analytics.qqFit(df, col("g"), col("v")).collect()(0)
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L, s"$r")
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0 &&
      r.getDouble(4) == 1.0, s"$r")
  }

  test("mantelHaenszel: pooled OR 3.5 with RBG CI; Simpson guard") {
    import spark.implicits._
    // stratum 1: a4 b1 c1 d4; stratum 2: a2 b2 c2 d2 -> OR 3.5,
    // CI (0.542043, 22.599696)
    def cells(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
      Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (cells("s1", 4, 1, 1, 4) ++ cells("s2", 2, 2, 2, 2))
      .toDF("st", "e", "o")
    val r = Analytics.mantelHaenszel(df, col("st"), col("e"), col("o"))
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 18L, s"$r")
    assert(r.getDouble(2) == 3.5 && r.getDouble(3) == 0.542043 &&
      r.getDouble(4) == 22.599696, s"$r")
    // perfectly concordant strata: pooled bc-sum is 0 -> undefined
    val conc = cells("s1", 3, 0, 0, 3).toDF("st", "e", "o")
    assert(Analytics.mantelHaenszel(conc, col("st"), col("e"), col("o"))
      .collect()(0).isNullAt(2))
  }

  test("energyDistance: disjoint combs separate; identical is zero") {
    import spark.implicits._
    // a = {0,2}, b = {1,3}: mu_xy 1.5, mu_xx 1.0, mu_yy 1.0 -> E = 1.0
    val df = Seq((true, 0L), (true, 2L), (false, 1L), (false, 3L))
      .toDF("g", "v")
    val r = Analytics.energyDistance(df, col("g"), col("v")).collect()(0)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)) == ((1.5, 1.0, 1.0, 1.0)), s"$r")
    // identical distributions: energy exactly 0
    val same = Seq((true, 1L), (true, 2L), (false, 1L), (false, 2L))
      .toDF("g", "v")
    assert(Analytics.energyDistance(same, col("g"), col("v"))
      .collect()(0).getDouble(5) == 0.0)
  }

  test("olsInfluence: corrupted high-leverage point tops Cook's D; trace(H)=p") {
    import spark.implicits._
    // exact plane y = 2 + 3x1 + 5x2 on a grid, then one far-out
    // corrupted point: it must dominate Cook's D
    val grid = for { x1 <- 0 to 2; x2 <- 0 to 2 } yield
      ((x1 * 3 + x2 + 1).toLong, x1.toDouble, x2.toDouble,
        2.0 + 3 * x1 + 5 * x2 + (if (x1 == 1 && x2 == 1) 0.07 else 0.0))
    val pts = (grid :+ (99L, 9.0, 9.0, 500.0))
      .toDF("id", "x1", "x2", "y")
    val out = Analytics.olsInfluence(pts, col("y"), col("x1"), col("x2"),
      Seq(col("id")), topK = 10).collect()
    assert(out.head.getLong(0) == 99L, s"${out.toSeq}")
    // hat-matrix trace is the parameter count (p = 3), and every
    // leverage sits in (0, 1]
    val hs = out.map(_.getDouble(2))
    assert(math.abs(hs.sum - 3.0) < 1e-3, s"trace ${hs.sum}")
    assert(hs.forall(h => h > 0 && h <= 1.0), s"${hs.toSeq}")
  }

  test("maxF1Threshold: hand sweep picks the F1-optimal cutoff") {
    import spark.implicits._
    // (10,+)(9,+)(8,-)(7,+)(6,-)(6,-): best t=7 -> tp3 fp1 fn0,
    // P=0.75 R=1 F1=0.857143
    val df = Seq((10L, true), (9L, true), (8L, false), (7L, true),
      (6L, false), (6L, false)).toDF("s", "y")
    val r = Analytics.maxF1Threshold(df, col("s"), col("y")).collect()(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 3L &&
      r.getLong(2) == 1L && r.getLong(3) == 0L, s"$r")
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 1.0 &&
      r.getDouble(6) == 0.857143, s"$r")
    // no positives: no operating point at all
    val neg = Seq((5L, false), (4L, false)).toDF("s", "y")
    assert(Analytics.maxF1Threshold(neg, col("s"), col("y")).count() == 0)
  }

  test("bowkerTest: directional confusion flagged; symmetric is 0; diagonal inert") {
    import spark.implicits._
    // (a->b): 4 vs (b->a): 1 -> 9/5; (a->c): 2 vs 0 -> 4/2; chi2 3.8
    val rows = Seq.fill(4)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(2)(("a", "c")) ++ Seq.fill(10)(("a", "a"))
    val r = Analytics.bowkerTest(rows.toDF("x", "y"), col("x"), col("y"))
      .collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 17L &&
      r.getDouble(2) == 3.8 && r.getLong(3) == 2L, s"$r")
    // perfectly symmetric disagreement: chi2 = 0, df counts the pair
    val sym = (Seq.fill(3)(("a", "b")) ++ Seq.fill(3)(("b", "a")))
      .toDF("x", "y")
    val r2 = Analytics.bowkerTest(sym, col("x"), col("y")).collect()(0)
    assert(r2.getDouble(2) == 0.0 && r2.getLong(3) == 1L, s"$r2")
    // all-diagonal: no informative pair -> null
    val diag = Seq(("a", "a"), ("b", "b")).toDF("x", "y")
    assert(Analytics.bowkerTest(diag, col("x"), col("y"))
      .collect()(0).isNullAt(2))
  }

  test("rmst: step-integral by hand; pre-first-event window at S=1") {
    import spark.implicits._
    // g: event@2, censored@4, event@6, tau 5:
    // [0,2) at 1, [2,4)+[4,5) at 0.666667 -> rmst 4.000001
    val df = Seq(("g", 2L, true), ("g", 4L, false), ("g", 6L, true))
      .toDF("grp", "dur", "obs")
    val r = Analytics.rmst(df, "grp", "dur", col("obs"), tau = 5L)
      .collect()(0)
    assert(r.getLong(1) == 5L && r.getDouble(2) == 4.000001 &&
      r.getLong(3) == 3L, s"$r")
    // first event beyond tau: whole window at S=1 -> rmst = tau
    val late = Seq(("h", 9L, true)).toDF("grp", "dur", "obs")
    assert(Analytics.rmst(late, "grp", "dur", col("obs"), tau = 5L)
      .collect()(0).getDouble(2) == 5.0)
  }

  test("qiniCurve: perfect-targeting bucket scores 1, exhaust to 0; no-control null") {
    import spark.implicits._
    // rank desc by score: (t,resp), (c,no), (t,no), (c,resp)
    // bucket 1: rt=1 rc=0 -> qini 1.0; full: 1 - 1*(2/2) = 0.0
    val u = Seq((1L, true, true, 100L), (2L, false, false, 90L),
      (3L, true, false, 50L), (4L, false, true, 40L))
      .toDF("id", "w", "y", "s")
    val out = Analytics.qiniCurve(u, col("id"), col("w"), col("y"),
        col("s"), buckets = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(5) == 1.0 && out(2L).getDouble(5) == 0.0,
      s"$out")
    assert(out(2L).getLong(1) == 2L && out(2L).getLong(2) == 2L)
    // all-treated head bucket: control empty -> qini undefined
    val h = Seq((1L, true, true, 100L), (2L, true, false, 90L),
      (3L, false, false, 50L), (4L, false, true, 40L))
      .toDF("id", "w", "y", "s")
    assert(Analytics.qiniCurve(h, col("id"), col("w"), col("y"),
      col("s"), buckets = 2).collect()
      .find(_.getLong(0) == 1L).get.isNullAt(5))
  }

  test("yuenTTest: whales trimmed, hand t/df; equals slices null-free") {
    import spark.implicits._
    // a = 0,10,20,1000 / b = 0,30,40,2000 at 25% trim: whales leave,
    // tmeans 15 vs 35, winsorized d = 50 each -> t = -2, df = 2
    val df = (Seq(0L, 10L, 20L, 1000L).map((true, _)) ++
      Seq(0L, 30L, 40L, 2000L).map((false, _))).toDF("a", "v")
    val r = Analytics.yuenTTest(df, col("a"), col("v"), trim = 0.25)
      .collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(2) == 2L &&
      r.getLong(3) == 2L, s"$r")
    assert(r.getDouble(4) == 15.0 && r.getDouble(5) == 35.0, s"$r")
    assert(r.getDouble(6) == -2.0 && r.getDouble(7) == 2.0, s"$r")
  }

  test("demingRegression: hand TLS line; steeper than OLS; zero-cov null") {
    import spark.implicits._
    // x=(1,2,3), y=(2,4,7): slope 2.528781, intercept -0.724228
    val df = Seq((1L, 2L), (2L, 4L), (3L, 7L)).toDF("x", "y")
    val r = Analytics.demingRegression(df, col("x"), col("y")).collect()(0)
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.528781 &&
      r.getDouble(2) == -0.724228 && r.getDouble(3) == 0.993399, s"$r")
    // OLS slope here is 2.5: Deming must sit above (x-noise unshrunk)
    assert(r.getDouble(1) > 2.5)
    // uncorrelated square: S_xy = 0 -> closed form degenerates
    val z = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    assert(Analytics.demingRegression(z, col("x"), col("y"))
      .collect()(0).isNullAt(1))
  }

  test("bartlett: hand chi2 over three groups; constant group null") {
    import spark.implicits._
    // vars 5/3, 20/3, 1/3 over n=4 each -> chi2 = 4.894706
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(2L, 4L, 6L, 8L).map(("b", _)) ++
      Seq(5L, 5L, 6L, 6L).map(("c", _))).toDF("g", "v")
    val r = Analytics.bartlett(df, "g", col("v")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 12L &&
      r.getDouble(2) == 4.894706 && r.getLong(3) == 2L, s"$r")
    // one constant group: ln(0) undefined -> null (use Brown-Forsythe)
    val cst = df.union(Seq(("d", 9L), ("d", 9L)).toDF("g", "v"))
    assert(Analytics.bartlett(cst, "g", col("v"))
      .collect()(0).isNullAt(2))
  }

  test("partialCorrelation: confounder partialled out by hand") {
    import spark.implicits._
    // x=1..4, y=(1,3,2,5), z=(1,1,2,2):
    // r_xy=0.831522, r_xz=0.894427, r_yz=0.507093 -> partial 0.980581
    val df = Seq((1L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 2L), (4L, 5L, 2L))
      .toDF("x", "y", "z")
    val r = Analytics.partialCorrelation(df, col("x"), col("y"), col("z"))
      .collect()(0)
    assert(r.getLong(0) == 4L, s"$r")
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((0.831522, 0.894427, 0.507093)), s"$r")
    assert(r.getDouble(4) == 0.980581, s"$r")
    // z == x: |r_xz| = 1 -> partial undefined
    val deg = Seq((1L, 2L, 1L), (2L, 1L, 2L), (3L, 4L, 3L))
      .toDF("x", "y", "z")
    assert(Analytics.partialCorrelation(deg, col("x"), col("y"),
      col("z")).collect()(0).isNullAt(4))
  }

  test("dunnTest: tie-free pooled ranks give hand pairwise z") {
    import spark.implicits._
    // a = {1,2}, b = {3,4}, c = {5}: mean ranks 1.5 / 3.5 / 5,
    // sigma^2 = 2.5 (no ties)
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L), ("c", 5L))
      .toDF("g", "v")
    val out = Analytics.dunnTest(df, "g", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(4)).toMap
    assert(out == Map(("a", "b") -> -1.264911, ("a", "c") -> -1.807392,
      ("b", "c") -> -0.774597), s"$out")
    // all-tied values: zero variance -> null z everywhere
    val tied = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("g", "v")
    assert(Analytics.dunnTest(tied, "g", col("v"))
      .collect().forall(_.isNullAt(4)))
  }

  test("cochranQ: hand 4x3 Q; all-ones denominator null; incomplete excluded") {
    import spark.implicits._
    // C = (3,3,1), R = (2,1,3,1): Q = 2*(3*19-49)/(21-15) = 2.666667
    // block 5 incomplete (2 of 3 treatments) -> excluded
    val cells = Seq(
      (1L, "t1", true), (1L, "t2", true), (1L, "t3", false),
      (2L, "t1", true), (2L, "t2", false), (2L, "t3", false),
      (3L, "t1", true), (3L, "t2", true), (3L, "t3", true),
      (4L, "t1", false), (4L, "t2", true), (4L, "t3", false),
      (5L, "t1", true), (5L, "t2", true)).toDF("b", "t", "x")
    val r = Analytics.cochranQ(cells, "b", "t", col("x")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L &&
      r.getLong(2) == 7L && r.getDouble(3) == 2.666667 &&
      r.getLong(4) == 2L, s"$r")
    // every block all-1: kN - sum R^2 = 0 -> undefined
    val ones = Seq((1L, "t1", true), (1L, "t2", true),
      (2L, "t1", true), (2L, "t2", true)).toDF("b", "t", "x")
    assert(Analytics.cochranQ(ones, "b", "t", col("x"))
      .collect()(0).isNullAt(3))
  }

  test("logRank: early-event arm flagged; balanced arms z=0") {
    import spark.implicits._
    // A dies early: events at 1,1,2; B: one event at 3, two censored
    // at 3 -> O_A=3, E_A=1.25, V=0.5875, z=2.283148, chi2=5.212766
    val df = Seq((true, 1L, true), (true, 1L, true), (true, 2L, true),
      (false, 3L, true), (false, 3L, false), (false, 3L, false))
      .toDF("a", "dur", "obs")
    val r = Analytics.logRank(df, col("a"), col("dur"), col("obs"))
      .collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L &&
      r.getLong(2) == 3L, s"$r")
    assert(r.getDouble(3) == 1.25 && r.getDouble(4) == 5.212766 &&
      r.getDouble(5) == 2.283148, s"$r")
    // mirror-symmetric arms: z = 0
    val bal = Seq((true, 1L, false), (true, 2L, true), (true, 3L, true),
      (false, 1L, true), (false, 2L, true), (false, 3L, false))
      .toDF("a", "dur", "obs")
    assert(Analytics.logRank(bal, col("a"), col("dur"), col("obs"))
      .collect()(0).getDouble(5) == 0.0)
  }

  test("welchTTest: hand t/df/d/g; single-row slice null") {
    import spark.implicits._
    // a = 1,2,3,4 vs b = 2,4,6,8,10: t = -2.251436, df = 5.520788,
    // d = -1.380419, g = -1.227039
    val df = (Seq(1L, 2L, 3L, 4L).map((true, _)) ++
      Seq(2L, 4L, 6L, 8L, 10L).map((false, _))).toDF("a", "v")
    val r = Analytics.welchTTest(df, col("a"), col("v")).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L, s"$r")
    assert(r.getDouble(2) == 2.5 && r.getDouble(3) == 6.0, s"$r")
    assert((r.getDouble(4), r.getDouble(5)) == ((-2.251436, 5.520788)),
      s"$r")
    assert((r.getDouble(6), r.getDouble(7)) == ((-1.380419, -1.227039)),
      s"$r")
    // n=1 slice: no variance -> everything but means null
    val tiny = Seq((true, 5L), (false, 1L), (false, 3L)).toDF("a", "v")
    val r2 = Analytics.welchTTest(tiny, col("a"), col("v")).collect()(0)
    assert(r2.getDouble(2) == 5.0 && r2.isNullAt(4) && r2.isNullAt(6),
      s"$r2")
  }

  test("cronbachAlpha: hand ratio, duplicate items give alpha 1, k=1 null") {
    import spark.implicits._
    // items (1,2,3) and (2,4,6): A = 6+24 = 30, B = 54,
    // alpha = 2*(1 - 30/54) = 0.888889
    val cells = Seq((1L, "i1", 1L), (2L, "i1", 2L), (3L, "i1", 3L),
      (1L, "i2", 2L), (2L, "i2", 4L), (3L, "i2", 6L)).toDF("c", "i", "v")
    val r = Analytics.cronbachAlpha(cells, "c", "i", col("v")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L &&
      r.getDouble(2) == 0.888889, s"$r")
    // identical items measure one thing exactly: alpha = 1
    val dup = Seq((1L, "a", 1L), (2L, "a", 5L), (1L, "b", 1L),
      (2L, "b", 5L)).toDF("c", "i", "v")
    assert(Analytics.cronbachAlpha(dup, "c", "i", col("v"))
      .collect()(0).getDouble(2) == 1.0)
    // single item: undefined
    assert(Analytics.cronbachAlpha(cells.filter(col("i") === "i1"),
      "c", "i", col("v")).collect()(0).isNullAt(2))
  }

  test("friedman: tie-corrected chi2; incomplete blocks excluded") {
    import spark.implicits._
    // blocks 1-2 untied ladders; block 3 ties t1=t2=3 (avg ranks 1.5);
    // block 4 incomplete (2 of 3 treatments) -> excluded
    // R2j = (7, 11, 18), ss4 = 123.5, tie mass 6, C = 1 - 6/72
    // chi2 = (12/(3*3*4)*123.5 - 36)/C = 5.636364
    val cells = Seq(
      (1L, "t1", 1L), (1L, "t2", 2L), (1L, "t3", 3L),
      (2L, "t1", 2L), (2L, "t2", 4L), (2L, "t3", 6L),
      (3L, "t1", 3L), (3L, "t2", 3L), (3L, "t3", 9L),
      (4L, "t1", 5L), (4L, "t2", 6L)).toDF("b", "t", "v")
    val r = Analytics.friedman(cells, "b", "t", col("v")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L &&
      r.getDouble(2) == 5.636364 && r.getLong(3) == 2L, s"$r")
    // untied 3x3: chi2 = 6.0 exactly
    val u = Analytics.friedman(cells.filter(col("b") <= 2 ||
        (col("b") === 3 && col("t") =!= "t2"))
      .union(Seq((3L, "t2", 6L)).toDF("b", "t", "v")), "b", "t", col("v"))
      .collect()(0)
    assert(u.getDouble(2) == 6.0, s"$u")
  }

  test("jarqueBera: right-skewed outlier case; constant and n=1 null") {
    import spark.implicits._
    // a: 1,2,3,4,100 -> g1 = 1.497537, g2 = 0.246716, JB = 1.881528
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("c", 7L), ("c", 7L), ("c", 7L), ("z", 5L)).toDF("g", "v")
    val out = Analytics.jarqueBera(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 5L && a.getDouble(2) == 1.497537 &&
      a.getDouble(3) == 0.246716 && a.getDouble(4) == 1.881528, s"$a")
    assert(out("c").isNullAt(4) && out("z").isNullAt(4), s"$out")
  }

  test("durbinWatson: alternating DW=3, constant DW=0, n=1 null") {
    import spark.implicits._
    // a: e = 1,-1,1,-1 -> sum d^2 = 12, sum e^2 = 4, DW = 3, rho = -0.5
    // b: constant nonzero residuals -> DW = 0, rho = 1 (max positive)
    // z: single row -> undefined
    val df = Seq(("a", 1L, 1.0), ("a", 2L, -1.0), ("a", 3L, 1.0),
      ("a", 4L, -1.0), ("b", 1L, 2.0), ("b", 2L, 2.0), ("b", 3L, 2.0),
      ("z", 1L, 5.0)).toDF("g", "t", "e")
    val out = Analytics.durbinWatson(df, "g", Seq(col("t")), col("e"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 4L &&
      out("a").getDouble(2) == 3.0 && out("a").getDouble(3) == -0.5,
      s"${out("a")}")
    assert(out("b").getDouble(2) == 0.0 && out("b").getDouble(3) == 1.0,
      s"${out("b")}")
    assert(out("z").isNullAt(2) && out("z").isNullAt(3), s"${out("z")}")
  }

  test("woeEncode: hand-computed WOE/IV, unseen-category zero, IV non-negative") {
    val fit = Seq(("a", "en"), ("a", "en"), ("a", "en"), ("a", "de"),
      ("b", "de"), ("b", "de")).toDF("source", "lang")
    val apply = Seq((1L, "a"), (2L, "b"), (3L, "zz")).toDF("doc_id", "source")
    val out = Analytics.woeEncode(fit, apply, "source",
        col("lang") === "en", Seq(col("doc_id")))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    // a: pos 3 neg 1; b: pos 0 neg 2; ptot 3 ntot 3
    def woe(p: Long, n: Long) =
      math.log(((p + 0.5) * 3.5) / ((n + 0.5) * 3.5))
    def share(p: Long, n: Long) = (p + 0.5) / 3.5 - (n + 0.5) / 3.5
    val iv = BigDecimal(share(3, 1) * woe(3, 1) + share(0, 2) * woe(0, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L)._1 - woe(3, 1)) < 1e-6, s"woe(a): $out")
    assert(math.abs(out(2L)._1 - woe(0, 2)) < 1e-6, s"woe(b): $out")
    assert(out(3L)._1 == 0.0, s"unseen category must encode 0: $out")
    assert(out.values.map(_._2).toSet == Set(iv), s"iv: $out vs $iv")
    // smoothing gives share and woe the same sign per cell -> IV >= 0
    assert(iv >= 0.0)
  }

  test("conformalOls: rank-exact qhat, coverage, tiny-cal null interval") {
    // fit pins the plane y = x1 exactly (x2 coefficient 0)
    val fit = Seq((0.0, 0.0, 0.0), (1.0, 0.0, 1.0), (0.0, 1.0, 0.0),
      (2.0, 1.0, 2.0)).toDF("x1", "x2", "y")
    // 9 calibration rows with |resid| = 0..8  =>  k = ceil(9*10/10) = 9,
    // qhat = 9th smallest = 8
    val cal = (0 to 8).map(r => (0.0, 0.0, r.toDouble)).toDF("x1", "x2", "y")
    // test residuals 5 (covered) and 9 (not)
    val test = Seq((0.0, 0.0, 5.0), (0.0, 0.0, 9.0)).toDF("x1", "x2", "y")
    val out = Analytics.conformalOls(fit, cal, test,
      col("y"), col("x1"), col("x2")).collect().head
    assert(out.getLong(0) == 9 && out.getLong(1) == 9, s"n_cal/k: $out")
    assert(out.getDouble(2) == 8.0, s"qhat: $out")
    assert(out.getLong(3) == 2 && out.getLong(4) == 1, s"covered: $out")
    assert(out.getDouble(5) == 0.5, s"coverage: $out")
    // n_cal = 3 => k = ceil(9*4/10) = 4 > 3: interval is infinite,
    // qhat and coverage must come back NULL, never a clamped value
    val tiny = Analytics.conformalOls(fit, cal.limit(3), test,
      col("y"), col("x1"), col("x2")).collect().head
    assert(tiny.getLong(1) == 4 && tiny.isNullAt(2), s"tiny-cal qhat: $tiny")
    assert(tiny.isNullAt(4) && tiny.isNullAt(5), s"tiny-cal coverage: $tiny")
  }

  test("sprtMonitor: h1/h0 crossings at hand-computed n, short stream continues") {
    // p0=0.2 p1=0.4: per-conversion step ln2~0.693, per-miss ln0.75~-0.288
    // all-hits arm crosses ln19~2.944 at n=5; all-miss arm at n=11
    val rows = (1 to 12).map(i => ("up", i.toLong, true)) ++
      (1 to 12).map(i => ("dn", i.toLong, false)) ++
      (1 to 3).map(i => ("sh", i.toLong, false))
    val df = rows.toDF("arm", "seq", "hit")
    val out = Analytics.sprtMonitor(df, col("arm"), Seq(col("seq")),
        col("hit"), p0 = 0.2, p1 = 0.4)
      .collect().map(r => r.getString(0) -> r).toMap
    val c1 = math.log(0.4 / 0.2); val c2 = math.log((1 - 0.4) / (1 - 0.2))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val up = out("up")
    assert(up.getLong(1) == 12 && up.getLong(3) == 5 &&
      up.getString(4) == "h1", s"$up")
    assert(up.getDouble(5) == r6(5 * c1), s"llr at crossing: $up")
    val dn = out("dn")
    assert(dn.getLong(3) == 11 && dn.getString(4) == "h0", s"$dn")
    assert(dn.getDouble(5) == r6(11 * c2), s"$dn")
    val sh = out("sh")
    assert(sh.getString(4) == "continue" && sh.isNullAt(3) && sh.isNullAt(5),
      s"$sh")
    assert(sh.getDouble(2) == r6(3 * c2), s"final llr: $sh")
  }

  test("captureRecapture: Chapman hand value, empty window yields NULL") {
    val a = Seq(1L, 2L, 3L, 4L, 4L).toDF("k") // dup must not inflate
    val b = Seq(3L, 4L, 5L).toDF("k")
    val out = Analytics.captureRecapture(a, b, "k").collect().head
    assert(out.getLong(0) == 4 && out.getLong(1) == 3 &&
      out.getLong(2) == 2, s"$out")
    // (4+1)(3+1)/(2+1) - 1 = 17/3
    assert(out.getDouble(3) == 5.666667, s"$out")
    val e = Analytics.captureRecapture(a, b.limit(0), "k").collect().head
    assert(e.getLong(1) == 0 && e.isNullAt(3), s"$e")
  }

  test("transitionLatency: hand gaps, order-statistic ranks") {
    val ev = Seq((7L, "A", 0L, 1L), (7L, "B", 10L, 2L),
      (7L, "A", 30L, 3L), (7L, "B", 100L, 4L),
      (8L, "B", 0L, 5L), (8L, "A", 20L, 6L))
      .toDF("user_id", "event_type", "tus", "event_id")
    val out = Analytics.transitionLatency(ev, "user_id", "event_type",
        col("tus"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A->B gaps {10, 70}: p50 = rank 1 = 10 (lower median), p90 = rank 2
    assert(out(("A", "B")) == ((2L, 10L, 70L)), s"$out")
    assert(out(("B", "A")) == ((2L, 20L, 20L)), s"$out")
  }

  test("wilsonInterval: hand values at z=1, nondegenerate at p=0") {
    val rows = (Seq.fill(2)(("g", true)) ++ Seq.fill(2)(("g", false)) ++
      Seq.fill(4)(("z", false))).toDF("g", "y")
    val out = Analytics.wilsonInterval(rows, "g", col("y"), z = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // n=4 p=.5: center .625, half sqrt(.25/4 + 1/64), denom 1.25
    assert(out("g") == ((0.5, 0.276393, 0.723607)), s"$out")
    // p = 0 still yields a real interval: [0, 0.2], never [0, 0]
    assert(out("z") == ((0.0, 0.0, 0.2)), s"$out")
  }

  test("mixAdjustedRates: equal stratum rates equalize adjusted KPIs; renormalized when strata missing") {
    val rows = (
      Seq.fill(4)(("A", "x", true)) ++ Seq.fill(4)(("A", "y", false)) ++
      Seq.fill(6)(("B", "x", true)) ++ Seq.fill(2)(("B", "y", false)) ++
      Seq.fill(2)(("C", "x", true)) ++ Seq.fill(2)(("C", "x", false)))
      .toDF("src", "stratum", "y")
    val out = Analytics.mixAdjustedRates(rows, "src", "stratum", col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // A and B have identical per-stratum rates (x: 1.0, y: 0.0) but
    // different mixes: raw differs, adjusted must agree
    assert(out("A")._1 == 0.5 && out("B")._1 == 0.75, s"$out")
    assert(out("A")._2 == out("B")._2, s"$out")
    assert(math.abs(out("B")._3 - (0.75 - out("B")._2)) < 1e-9, s"$out")
    // C exists only in stratum x: weights renormalize -> its own rate
    assert(out("C")._2 == 0.5, s"$out")
  }

  test("cvOls: planted plane scores zero error on every fold") {
    // y = 2 + 3*x1 + 5*x2 exactly, folds by id % 3 (all folds see
    // enough spread to recover the plane)
    val rows = (1 to 30).map { i =>
      val (x1, x2) = ((i % 5).toDouble, (i % 7).toDouble)
      (i.toLong, x1, x2, 2.0 + 3 * x1 + 5 * x2)
    }.toDF("id", "x1", "x2", "y")
    val out = Analytics.cvOls(rows, col("id") % 3, k = 3,
        col("y"), col("x1"), col("x2"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(0L, 1L, 2L), s"$out")
    assert(out.values.forall(v => v._2 == 0.0 && v._3 == 0.0), s"$out")
    assert(out.values.map(_._1).sum == 30, s"$out")
  }

  test("liftTable: top bucket lift 2x when top half holds all positives") {
    val rows = (1 to 10).map(i => (i.toLong, (11 - i).toDouble, i <= 5))
      .toDF("id", "score", "y")
    val out = Analytics.liftTable(rows, col("score"), col("y"),
        col("id"), buckets = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
         r.getDouble(5))).toMap
    // ids 1..5 have the top scores AND all the positives
    assert(out(0L) == ((5L, 5L, 1.0, 2.0, 1.0)), s"$out")
    assert(out(1L) == ((5L, 0L, 0.0, 0.0, 1.0)), s"$out")
  }

  test("splitBalanceAudit: hand chi2 on a 2x2, balanced split is silent") {
    val rows = (Seq.fill(3)(("a", "x")) ++ Seq.fill(1)(("a", "y")) ++
      Seq.fill(1)(("b", "x")) ++ Seq.fill(3)(("b", "y")))
      .toDF("split", "label")
    val out = Analytics.splitBalanceAudit(rows, "split", "label")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
         r.getLong(6))).toMap
    // margins 4/4 x 4/4 over 8 -> every expected is 2
    assert(out(("a", "x")) == ((3L, 2.0, 0.5, 2.0, 1L)), s"$out")
    assert(out(("b", "y")) == ((3L, 2.0, 0.5, 2.0, 1L)), s"$out")
    val balanced = (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(2)(("b", "y")))
      .toDF("split", "label")
    val b = Analytics.splitBalanceAudit(balanced, "split", "label")
      .collect()
    assert(b.forall(r => r.getDouble(5) == 0.0 && r.getDouble(4) == 0.0),
      s"${b.toSeq}")
  }

  test("ebShrinkRates: scala-replicated MoM prior, small-n pulls harder, degenerate passthrough") {
    // groups: 0/2 (tiny, extreme), 50/100, 60/100, 40/100
    val rows = (Seq.fill(2)(("t", false)) ++
      (1 to 100).map(i => ("a", i <= 50)) ++
      (1 to 100).map(i => ("b", i <= 60)) ++
      (1 to 100).map(i => ("c", i <= 40))).toDF("g", "y")
    val out = Analytics.ebShrinkRates(rows, "g", col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    // replicate: rates and x1e12-quantized moments
    def q12(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    val rates = Seq(0.0, 0.5, 0.6, 0.4)
    val k = 4
    val m = (rates.map(q12).sum.toDouble / 1e12) / k
    val v = (rates.map(x => q12(x * x)).sum.toDouble / 1e12 - k * m * m) /
      (k - 1)
    val bk = m * (1.0 - m) / v - 1
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def shrunk(pos: Long, n: Long) = r6((pos + m * bk) / (n + bk))
    assert(out("t") == ((0.0, shrunk(0, 2))), s"$out")
    assert(out("a") == ((0.5, shrunk(50, 100))), s"$out")
    // the tiny extreme group moves toward the prior mean...
    assert(math.abs(out("t")._2 - m) < math.abs(0.0 - m), s"$out")
    // ...much more than a well-sampled group does
    assert(math.abs(out("t")._2 - 0.0) > math.abs(out("a")._2 - 0.5),
      s"$out")
    // identical rates everywhere: zero variance -> shrinkage disabled
    val const = (1 to 4).flatMap(g => Seq((s"g$g", true), (s"g$g", false)))
      .toDF("g", "y")
    val c = Analytics.ebShrinkRates(const, "g", col("y")).collect()
    assert(c.forall(r => r.getDouble(4) == r.getDouble(3) && r.isNullAt(5)),
      s"${c.toSeq}")
  }

  test("segmentScan: hand-computed z flags extremes, balanced segment silent, degenerate NULL") {
    val rows = ((1 to 8).map(_ => ("X", "all", true)) ++
      (1 to 8).map(_ => ("Y", "all", false))).toDF("s1", "s2", "y")
    val out = Analytics.segmentScan(rows, col("y"),
        Seq(("d1", col("s1")), ("d2", col("s2"))), zThresh = 2.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5))
      .toMap
    // p = .5; all-true segment of 8: z = .5 / sqrt(.25/8) = 2.828427
    assert(out.keySet == Set(("d1", "X"), ("d1", "Y")), s"$out")
    assert(out(("d1", "X")) == 2.828427 && out(("d1", "Y")) == -2.828427,
      s"$out")
    // degenerate global rate: z undefined, no crash, no rows
    val allTrue = rows.withColumn("y", lit(true))
    assert(Analytics.segmentScan(allTrue, col("y"),
      Seq(("d1", col("s1"))), 0.0).isEmpty)
  }

  test("tukeyHsd: hand-computed q stats, familywise flags, zero-variance NULLs") {
    val rows = Seq(("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0),
      ("c", 1.0), ("c", 3.0)).toDF("g", "v")
    val out = Analytics.tukeyHsd(rows, "g", col("v"), qCrit = 3.858)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    // mse = 20000 cents^2; se(any pair) = 100 cents
    assert(out(("a", "b")) == ((10.0, 10.0, true)), s"$out")
    assert(out(("a", "c")) == ((0.0, 0.0, false)), s"$out")
    assert(out(("b", "c")) == ((10.0, 10.0, true)), s"$out")
    // all-constant groups: ssw = 0 -> q undefined, not infinite
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val c = Analytics.tukeyHsd(const, "g", col("v"), 3.858).collect().head
    assert(c.isNullAt(5) && c.isNullAt(6), s"$c")
  }

  test("replayEvaluate: matched-only means, never-matching policy NULLs, logged baseline") {
    val log = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("b", 100.0, 3L))
      .toDF("action", "reward", "uid")
    val out = Analytics.replayEvaluate(log, col("action"), col("reward"),
        Seq(("always_a", lit("a")), ("never", lit("z")),
          ("logged", col("action"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    // replay keeps ONLY rows where the logged action matches
    assert(out("always_a") == ((3L, 2L, 0.666667, Some(2.0))), s"$out")
    assert(out("never") == ((3L, 0L, 0.0, None)), s"$out")
    // the logged policy matches everything: overall mean
    assert(out("logged") == ((3L, 3L, 1.0, Some(34.666667))), s"$out")
  }

  test("rbo: identical lists hit the truncated max, disjoint hit 0, depth weighting") {
    def ranks(items: Seq[Long]) =
      items.zipWithIndex.map { case (it, i) => (it, (i + 1).toLong) }
        .toDF("item", "rank")
    val a = ranks(Seq(1L, 2L, 3L, 4L, 5L))
    def run(x: org.apache.spark.sql.DataFrame,
            y: org.apache.spark.sql.DataFrame) =
      Analytics.rbo(x, y, "item", "rank", k = 5).collect().head
    val same = run(a, a)
    // identical: (1-p) * sum p^(d-1) = 1 - p^k = 1 - 0.9^5
    assert(same.getLong(1) == 5 && same.getLong(2) == 5)
    assert(math.abs(same.getDouble(3) - (1 - math.pow(0.9, 5))) < 2e-6,
      s"$same")
    val disjoint = run(a, ranks(Seq(11L, 12L, 13L, 14L, 15L)))
    assert(disjoint.getDouble(3) == 0.0, s"$disjoint")
    // agreement at the TOP outweighs the same overlap at the bottom
    val topAgree = run(a, ranks(Seq(1L, 2L, 13L, 14L, 15L)))
    val botAgree = run(a, ranks(Seq(11L, 12L, 13L, 4L, 5L)))
    assert(topAgree.getDouble(3) > botAgree.getDouble(3),
      s"$topAgree vs $botAgree")
  }

  test("clusteringAgreement: identical=1/1/1, crossed=-0.5/0/0.5, single-cluster ARI/NMI NULL") {
    def run(pairs: Seq[(String, String)]) =
      Analytics.clusteringAgreement(pairs.toDF("x", "y"), col("x"), col("y"))
        .head
    // identical partitions: perfect agreement on all three
    val same = run(Seq("a" -> "p", "a" -> "p", "b" -> "q", "b" -> "q"))
    assert(same.getLong(0) == 4L && same.getDouble(1) == 1.0 &&
      same.getDouble(2) == 1.0 && same.getDouble(3) == 1.0, s"$same")
    // fully crossed 2x2: sij=0, sa=sb=2, C(4,2)=6 ->
    // ARI = 2*(0-4)/(6*4-8) = -0.5; MI terms all ln(1)=0 -> NMI 0;
    // purity = (1+1)/4
    val cross = run(Seq("a" -> "p", "a" -> "q", "b" -> "p", "b" -> "q"))
    assert(cross.getDouble(1) == -0.5 && cross.getDouble(2) == 0.0 &&
      cross.getDouble(3) == 0.5, s"$cross")
    // both labelings a single cluster: ARI denominator 0, entropies 0
    val one = run(Seq("a" -> "p", "a" -> "p"))
    assert(one.isNullAt(1) && one.isNullAt(2) && one.getDouble(3) == 1.0,
      s"$one")
    // NULL labels excluded
    val withNull = Analytics.clusteringAgreement(
      Seq(("a", "p"), ("a", "p"), (null, "q"), ("b", null), ("b", "q"))
        .toDF("x", "y"), col("x"), col("y")).head
    assert(withNull.getLong(0) == 3L, s"$withNull")
  }

  test("nelsonAalen: hand-computed cumulative hazard with censoring") {
    // same data as the KM spec: t=1 event (n=4) H=1/4; t=2 censored
    // (n=3) H unchanged; t=3 one event of n=2 -> H = 1/4 + 1/2 = 3/4
    val df = Seq(("A", 1L, true), ("A", 2L, false), ("A", 3L, true),
      ("A", 3L, false)).toDF("g", "t", "obs")
    val out = Analytics.nelsonAalen(df, "g", "t", col("obs"))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((4L, 1L, 0.25, 0.778801)), s"${out(1L)}")
    assert(out(2L) == ((3L, 0L, 0.25, 0.778801)), s"${out(2L)}")
    assert(out(3L) == ((2L, 1L, 0.75, 0.472367)), s"${out(3L)}")
  }

  test("nelsonAalen: d = n needs no extinct pin; NA survival > KM's 0") {
    // t=1: 1 of 2 dies (H=0.5); t=2: the last one dies (term 1, H=1.5)
    // where KM pins S=0, NA survival stays exp(-1.5) > 0
    val df = Seq(("g", 1L, true), ("g", 2L, true)).toDF("g", "t", "obs")
    val out = Analytics.nelsonAalen(df, "g", "t", col("obs"))
      .orderBy("t").collect()
    assert(out.map(_.getDouble(4)).toSeq == Seq(0.5, 1.5))
    assert(out.map(_.getDouble(5)).toSeq == Seq(0.606531, 0.22313))
    val km = Analytics.kaplanMeier(df, "g", "t", col("obs"))
      .orderBy("t").collect().map(_.getDouble(4))
    assert(km.last == 0.0 && out.last.getDouble(5) > 0.0)
  }

  test("classificationReport: hand-computed P/R/F1, kappa, macro-F1") {
    // gold/pred: (a,a)x2 (a,b) (b,b) (b,a) (c,a) -- N=6, agree=3
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "a"), ("c", "a")).toDF("g", "p")
    val out = Analytics.classificationReport(df, col("g"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c"))
    val a = out("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((3L, 4L, 2L)))
    assert(a.getDouble(4) == 0.5 && a.getDouble(5) == 0.666667 &&
      a.getDouble(6) == 0.571429, s"$a")
    val b = out("b")
    assert(b.getDouble(4) == 0.5 && b.getDouble(5) == 0.5 &&
      b.getDouble(6) == 0.5, s"$b")
    // c: never predicted -> precision NULL, recall 0, F1 0
    val c = out("c")
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) == ((1L, 0L, 0L)))
    assert(c.isNullAt(4) && c.getDouble(5) == 0.0 && c.getDouble(6) == 0.0,
      s"$c")
    // accuracy 3/6; pe = (3*4 + 2*2)/36 = 4/9; kappa = (1/18)/(5/9) = 0.1
    assert(a.getDouble(7) == 0.5 && a.getDouble(8) == 0.1, s"$a")
    // macro-F1 = (4/7 + 1/2 + 0)/3 quantized
    assert(a.getDouble(9) == 0.357143, s"$a")
  }

  test("classificationReport: perfect agreement; single-label kappa NULL") {
    val perfect = Analytics.classificationReport(
      Seq(("x", "x"), ("y", "y")).toDF("g", "p"), col("g"), col("p")).head()
    assert(perfect.getDouble(7) == 1.0 && perfect.getDouble(8) == 1.0 &&
      perfect.getDouble(9) == 1.0, s"$perfect")
    // both sides a single label: chance agreement 1 -> kappa undefined
    val one = Analytics.classificationReport(
      Seq(("x", "x"), ("x", "x")).toDF("g", "p"), col("g"), col("p")).head()
    assert(one.getDouble(7) == 1.0 && one.isNullAt(8), s"$one")
  }

  test("averagePrecision: hand-computed step AP; tie block is one level") {
    // desc levels: s=5 (+) term 1*(1/1); s=4 (-) 0; s=3 tie block
    // (one +, one -) term 1*(2/4); s=1 (-) 0 -> AP = 1.5/2 = 0.75
    val df = Seq(("g", 5L, true), ("g", 4L, false), ("g", 3L, true),
      ("g", 3L, false), ("g", 1L, false)).toDF("g", "s", "y")
    val out = Analytics.averagePrecision(df, "g", col("s"), col("y")).head()
    assert((out.getLong(1), out.getLong(2), out.getDouble(3)) ==
      ((2L, 3L, 0.75)), s"$out")
  }

  test("averagePrecision: perfect ranking is 1; no-positive group dropped") {
    val df = Seq(("p", 9L, true), ("p", 8L, true), ("p", 1L, false),
      ("n", 5L, false), ("n", 4L, false),
      ("allpos", 2L, true)).toDF("g", "s", "y")
    val by = Analytics.averagePrecision(df, "g", col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(by == Map("p" -> 1.0, "allpos" -> 1.0), s"$by")
  }

  test("attributionCompare: first/last/linear agree on hand-built journeys") {
    // u1: view@10, click@20, purchases @30 and @40 (both see both
    // touches at lookback 100); u2: bare purchase and a same-instant
    // touch (excluded by the -1 frame bound)
    val ev = Seq(
      ("u1", 10L, 1L, "view"), ("u1", 20L, 2L, "click"),
      ("u1", 30L, 3L, "purchase"), ("u1", 40L, 4L, "purchase"),
      ("u2", 5L, 5L, "purchase"),
      ("u2", 50L, 6L, "click"), ("u2", 50L, 7L, "purchase"))
      .toDF("u", "t", "id", "ty")
    val out = Analytics.attributionCompare(ev, col("u"), col("t"),
        col("id"), col("ty"), "purchase", lookbackNs = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("view", "click"), s"$out")
    assert(out("view") == ((2L, 0L, 1.0)), s"$out")
    assert(out("click") == ((0L, 2L, 1.0)), s"$out")
  }

  test("leaderboardChurn: stayed/entered/exited with exact rank shifts") {
    // topN=2: A top {k1,k2}, B top {k1,k3} -> k1 stays (shift 0),
    // k2 exits, k3 enters, k4 never appears
    val df = Seq(("k1", true, 100L), ("k1", false, 90L),
      ("k2", true, 50L), ("k3", false, 80L),
      ("k4", true, 10L), ("k4", false, 10L)).toDF("k", "a", "m")
    val out = Analytics.leaderboardChurn(df, "k", col("a"), col("m"), 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("k1", "k2", "k3"), s"$out")
    val k1 = out("k1")
    assert(k1.getString(3) == "stayed" && k1.getLong(1) == 1L &&
      k1.getLong(2) == 1L && k1.getLong(4) == 0L, s"$k1")
    assert(out("k2").getString(3) == "exited" &&
      out("k2").isNullAt(2), s"${out("k2")}")
    assert(out("k3").getString(3) == "entered" &&
      out("k3").isNullAt(1), s"${out("k3")}")
  }

  test("overdispersion: flat counts VMR 0; one clump flags; degenerates dropped") {
    val df = Seq(("flat", 2L), ("flat", 2L), ("flat", 2L), ("flat", 2L),
      ("clump", 0L), ("clump", 0L), ("clump", 0L), ("clump", 8L),
      ("one", 5L), ("zero", 0L), ("zero", 0L)).toDF("g", "cnt")
    val out = Analytics.overdispersion(df, "g", col("cnt"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("flat", "clump"), s"$out")
    val f = out("flat")
    assert(f.getDouble(2) == 2.0 && f.getDouble(3) == 0.0 &&
      !f.getBoolean(5), s"$f")
    val c = out("clump")
    assert(c.getDouble(2) == 2.0 && c.getDouble(3) == 8.0 &&
      c.getDouble(4) == 24.0 && c.getBoolean(5), s"$c")
  }

  test("twoProportionCI: Newcombe bounds bracket the difference; symmetric case") {
    // a: 2/4, b: 1/4 -> diff 0.25; CI must bracket it inside [-1, 1]
    val df = Seq(("a", true), ("a", true), ("a", false), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false))
      .toDF("g", "y")
    val out = Analytics.twoProportionCI(df, col("g") === "a", col("y"))
      .head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((4L, 2L, 4L, 1L)), s"$out")
    assert(out.getDouble(4) == 0.5 && out.getDouble(5) == 0.25 &&
      out.getDouble(6) == 0.25, s"$out")
    val (lo, hi) = (out.getDouble(7), out.getDouble(8))
    assert(lo < 0.25 && hi > 0.25 && lo >= -1.0 && hi <= 1.0, s"$out")
    // identical groups: diff 0, CI symmetric around 0
    val eq = Analytics.twoProportionCI(
      Seq(("a", true), ("a", false), ("b", true), ("b", false))
        .toDF("g", "y"), col("g") === "a", col("y")).head()
    assert(eq.getDouble(6) == 0.0 &&
      eq.getDouble(7) == -eq.getDouble(8), s"$eq")
  }

  test("mcnemar: discordant counts, continuity correction, NULL pairs dropped") {
    // n01=2, n10=1 -> chi2 = (|2-1|-1)^2/3 = 0
    val df = Seq((Some(false), Some(true)), (Some(false), Some(true)),
      (Some(true), Some(false)), (Some(true), Some(true)),
      (Some(false), Some(false)), (None, Some(true)))
      .toDF("a", "b")
    val out = Analytics.mcnemar(df, col("a"), col("b")).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getDouble(3)) == ((5L, 2L, 1L, 0.0)), s"$out")
    // one-sided discordance: (3-1)^2/3 = 4/3
    val oneSided = Analytics.mcnemar(Seq((false, true), (false, true),
      (false, true)).toDF("a", "b"), col("a"), col("b")).head()
    assert(oneSided.getDouble(3) == 1.333333, s"$oneSided")
    // no discordant pairs: chi2 undefined, not 0
    val none = Analytics.mcnemar(Seq((true, true), (false, false))
      .toDF("a", "b"), col("a"), col("b")).head()
    assert(none.isNullAt(3), s"$none")
  }

  test("brownForsythe: hand-computed F on |x - median|; quantized k-sum") {
    // g1 {1,2,3}: med 2, z {1,0,1}; g2 {10,20,30,40}: lower med 20,
    // z {10,0,10,20}. qsb: floor(4/3+.5)=1, floor(1600/4+.5)=400;
    // SB=401, SQ=602, s=42, n=7 -> ssb=149, ssw=201,
    // F=(149/1)/(201/5)=3.706468, eta=149/350=0.425714
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L),
      ("g2", 10L), ("g2", 20L), ("g2", 30L), ("g2", 40L))
      .toDF("g", "v")
    val out = Analytics.brownForsythe(df, "g", col("v"), scale = 1L).head()
    assert((out.getLong(0), out.getLong(1)) == ((2L, 7L)), s"$out")
    assert(out.getDouble(2) == 149.0 && out.getDouble(3) == 201.0, s"$out")
    assert(out.getDouble(4) == 3.706468 && out.getDouble(5) == 0.425714,
      s"$out")
  }

  test("kendallTauB: hand-computed with an x-tie; perfect monotone; constant NULL") {
    // pairs: 4 concordant, 1 discordant, 1 x-tie ->
    // tau = 3/sqrt(5*6) = 0.547723
    val df = Seq(("g", 1L, 1L, 10L), ("g", 2L, 2L, 20L),
      ("g", 3L, 3L, 15L), ("g", 4L, 3L, 25L)).toDF("g", "t", "x", "y")
    val out = Analytics.kendallTauB(df, "g", col("t"), col("x"), col("y"))
      .head()
    assert((out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4),
      out.getLong(5)) == ((6L, 4L, 1L, 1L, 0L)), s"$out")
    assert(out.getDouble(6) == 0.547723, s"$out")
    val mono = Analytics.kendallTauB(
      Seq(("g", 1L, 1L, 1L), ("g", 2L, 2L, 4L), ("g", 3L, 5L, 9L))
        .toDF("g", "t", "x", "y"), "g", col("t"), col("x"), col("y")).head()
    assert(mono.getDouble(6) == 1.0, s"$mono")
    // constant y: every pair y-tied, denominator factor 0
    val const = Analytics.kendallTauB(
      Seq(("g", 1L, 1L, 7L), ("g", 2L, 2L, 7L)).toDF("g", "t", "x", "y"),
      "g", col("t"), col("x"), col("y")).head()
    assert(const.isNullAt(6), s"$const")
  }

  test("cochranArmitage: hand-computed rising trend; flat is 0; degenerate NULL") {
    // s=0: 0/4, s=1: 2/4, s=2: 4/4 -> T'=48, vc=3456, chi2=8, sign +1
    def mk(rows: Seq[(Long, Boolean)]) = Analytics.cochranArmitage(
      rows.toDF("s", "y"), col("s"), col("y")).head()
    val rising = mk(Seq.fill(4)((0L, false)) ++
      Seq((1L, true), (1L, true), (1L, false), (1L, false)) ++
      Seq.fill(4)((2L, true)))
    assert((rising.getLong(0), rising.getLong(1), rising.getLong(2)) ==
      ((12L, 6L, 3L)), s"$rising")
    assert(rising.getDouble(3) == 8.0 && rising.getInt(4) == 1, s"$rising")
    val flat = mk(Seq((0L, true), (0L, false), (1L, true), (1L, false)))
    assert(flat.getDouble(3) == 0.0 && flat.getInt(4) == 0, s"$flat")
    // no successes: variance core 0 -> chi2 undefined
    val degen = mk(Seq((0L, false), (1L, false)))
    assert(degen.isNullAt(3), s"$degen")
  }

  test("jackknifeRatio: hand-computed LOO variance; all-mass bucket dropped") {
    // buckets (10,2) (20,2) (30,2): ratio 10, LOO 12.5/10/7.5,
    // devs^2 sum 12.5 -> se = sqrt(2/3 * 12.5) = 2.886751
    val df = Seq((0L, 4L, 1L), (0L, 6L, 1L), (1L, 20L, 2L), (2L, 30L, 2L))
      .toDF("b", "num", "den")
    val out = Analytics.jackknifeRatio(df, col("b"), col("num"), col("den"))
      .head()
    assert(out.getLong(0) == 3L && out.getDouble(1) == 10.0 &&
      out.getDouble(2) == 2.886751, s"$out")
    // a single bucket holds all denominator mass: no LOO term exists
    val single = Analytics.jackknifeRatio(
      Seq((0L, 5L, 1L)).toDF("b", "num", "den"),
      col("b"), col("num"), col("den"))
    assert(single.isEmpty, s"${single.collect().mkString}")
  }

  test("mdePower: hand-computed pooled sd and MDE at fixed z constants") {
    // a {1,3}, b {2,4} at scale 1: pooled sd = sqrt2,
    // mde = 2.801585 * sqrt2 * sqrt(1/2+1/2) = 3.96204, rel /2
    val df = Seq((true, 1L), (true, 3L), (false, 2L), (false, 4L))
      .toDF("a", "v")
    val out = Analytics.mdePower(df, col("a"), col("v"), scale = 1L).head()
    assert((out.getLong(0), out.getLong(1)) == ((2L, 2L)), s"$out")
    assert(out.getDouble(2) == 2.0 && out.getDouble(3) == 3.0, s"$out")
    assert(out.getDouble(4) == 1.414214 && out.getDouble(5) == 3.96204 &&
      out.getDouble(6) == 1.98102, s"$out")
    // a variant with n = 1 makes the pooled variance undefined
    val tiny = Analytics.mdePower(
      Seq((true, 1L), (false, 2L), (false, 4L)).toDF("a", "v"),
      col("a"), col("v"), scale = 1L)
    assert(tiny.isEmpty)
  }

  test("brownForsythe: equal spreads give F near 0; zero-ssw NULL") {
    // identical shapes shifted: z profiles equal -> ssb = 0 -> F = 0
    val eq = Analytics.brownForsythe(
      Seq(("a", 1L), ("a", 3L), ("b", 11L), ("b", 13L)).toDF("g", "v"),
      "g", col("v"), scale = 1L).head()
    assert(eq.getDouble(2) == 0.0 && eq.getDouble(4) == 0.0, s"$eq")
    // all constants: ssw = 0 -> F undefined
    val const = Analytics.brownForsythe(
      Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L)).toDF("g", "v"),
      "g", col("v"), scale = 1L).head()
    assert(const.isNullAt(4), s"$const")
  }

  test("breuschPagan: hand-computed Koenker LM; exact fit gives NULL") {
    val df = Seq((10.0, 1.0, 2.0), (12.0, 2.0, 1.0), (15.0, 3.0, 3.0),
      (9.0, 1.0, 1.0), (20.0, 5.0, 2.0), (30.0, 6.0, 7.0),
      (14.0, 2.0, 3.0), (22.0, 4.0, 5.0)).toDF("y", "x1", "x2")
    val out = Analytics.breuschPagan(df, col("y"), col("x1"),
      col("x2")).head()
    assert(out.getLong(0) == 8L && out.getLong(2) == 2L, s"$out")
    assert(out.getDouble(1) == 0.044011 && out.getDouble(3) == 0.005501,
      s"$out")
    // y = 2 x1 exactly -> every squared residual quantizes to 0 ->
    // zero auxiliary variance -> NULL lm
    val p = Analytics.breuschPagan(
      Seq((2.0, 1.0, 1.0), (4.0, 2.0, 3.0), (6.0, 3.0, 2.0),
        (8.0, 4.0, 4.0)).toDF("y", "x1", "x2"),
      col("y"), col("x1"), col("x2")).head()
    assert(p.isNullAt(1) && p.isNullAt(3), s"$p")
  }

  test("chowTest: hand-computed F across regimes; empty segment guards") {
    val a = Seq((10.0, 1.0, 1.0, false), (21.0, 2.0, 2.0, false),
      (29.0, 3.0, 1.0, false), (42.0, 4.0, 3.0, false),
      (48.0, 5.0, 2.0, false))
    val b = Seq((22.0, 1.0, 2.0, true), (39.0, 2.0, 1.0, true),
      (62.0, 3.0, 3.0, true), (78.0, 4.0, 2.0, true),
      (104.0, 5.0, 4.0, true))
    val out = Analytics.chowTest((a ++ b).toDF("y", "x1", "x2", "sb"),
      col("sb"), col("y"), col("x1"), col("x2")).head()
    assert((out.getLong(0), out.getLong(1)) == ((5L, 5L)), s"$out")
    assert(out.getDouble(2) == 2173.298246 && out.getDouble(3) == 1.094737 &&
      out.getDouble(4) == 2.266667 && out.getDouble(5) == 860.726514,
      s"$out")
    // one regime only -> B side is empty -> F null
    val one = Analytics.chowTest(a.toDF("y", "x1", "x2", "sb"),
      col("sb"), col("y"), col("x1"), col("x2")).head()
    assert(one.isNullAt(5), s"$one")
  }

  test("vif3: near-collinear x3 inflates; hand-pinned R² ladder") {
    val df = Seq((1.0, 2.0, 3.1), (2.0, 1.0, 2.9), (3.0, 3.0, 6.2),
      (4.0, 2.0, 5.9), (5.0, 5.0, 10.1), (6.0, 4.0, 9.8))
      .toDF("x1", "x2", "x3")
    val out = Analytics.vif3(df, col("x1"), col("x2"), col("x3"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("x1") == ((0.997837, 462.243056)), s"$out")
    assert(out("x2") == ((0.997799, 454.428241)), s"$out")
    assert(out("x3") == ((0.999378, 1608.262963)), s"$out")
  }

  test("brunnerMunzel: hand-computed W with ties; zero variance guards") {
    val a = Seq(1L, 2L, 1L, 4L, 5L, 3L).map(v => (true, v))
    val b = Seq(3L, 3L, 4L, 5L, 6L, 7L, 6L).map(v => (false, v))
    val out = Analytics.brunnerMunzel((a ++ b).toDF("a", "s"),
      col("a"), col("s")).head()
    assert((out.getLong(0), out.getLong(1)) == ((6L, 7L)), s"$out")
    assert(out.getDouble(2) == 0.833333 && out.getDouble(3) == 2.923442,
      s"$out")
    // both groups constant: every deviation clears to 0 -> W null
    val z = Analytics.brunnerMunzel(
      Seq((true, 1L), (true, 1L), (false, 2L), (false, 2L)).toDF("a", "s"),
      col("a"), col("s")).head()
    assert(z.isNullAt(3), s"$z")
  }

  test("andersonDarling: pinned A&S-Φ replay; n<8 and constant groups drop") {
    val g = Seq(100L, 200L, 150L, 130L, 170L, 185L, 90L, 210L, 160L,
      140L, 155L, 175L).map(v => ("g", v))
    val h = Seq.fill(7)(("h", 5L))         // n = 7 < 8
    val c = Seq.fill(9)(("c", 5L))         // constant: zero variance
    val out = Analytics.andersonDarling((g ++ h ++ c).toDF("k", "v"),
      "k", col("v")).collect()
    assert(out.length == 1 && out.head.getString(0) == "g", s"${out.toSeq}")
    assert(out.head.getLong(1) == 12L &&
      out.head.getDouble(2) == 0.1729 &&
      out.head.getDouble(3) == 0.186408, s"${out.head}")
  }
  test("andersonDarling: tie-invariant under input order and partitioning") {
    // heavy ties: the asc/desc row_number pairing onto physical rows
    // is arbitrary within a tied value block — the separately-floored
    // parts must make the sum invariant anyway (the round-9 advice fix)
    val vals = Seq(100L, 100L, 100L, 150L, 150L, 200L, 200L, 200L,
      200L, 250L, 300L, 300L).map(("g", _))
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.andersonDarling(df, "k", col("v")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
    val a = run(vals.toDF("k", "v"))
    val b = run(vals.reverse.toDF("k", "v").repartition(7))
    val c = run(vals.sortBy(_._2).toDF("k", "v").repartition(3))
    assert(a.nonEmpty && a == b && a == c, s"$a vs $b vs $c")
  }

  test("passAtK: hand-computed estimator; saturation and short-task guards") {
    val rows = (1 to 10).map(i => ("t1", i <= 3)) ++   // n=10 c=3
      (1 to 10).map(i => ("t2", false)) ++             // c=0 -> 0
      (1 to 10).map(i => ("t3", i <= 7)) ++            // n-c=3 < 5 -> 1
      (1 to 4).map(i => ("t4", true))                  // n=4 < k -> dropped
    val out = Analytics.passAtK(rows.toDF("task", "ok"), col("task"),
        col("ok"), k = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // t1: 1 - C(7,5)/C(10,5) = 1 - 21/252
    assert(out == Map("t1" -> 0.916667, "t2" -> 0.0, "t3" -> 1.0), s"$out")
  }

  test("isotonicCalibration: PAV pools the violating pair; monotone output") {
    val rows = (1 to 10).map(i => (0.1, i <= 3)) ++   // bin 0 rate .3
      (1 to 10).map(i => (0.3, i <= 1)) ++            // bin 1 rate .1 (violates)
      (1 to 10).map(i => (0.6, i <= 6))               // bin 2 rate .6
    val out = Analytics.isotonicCalibration(rows.toDF("s", "y"),
        col("s"), col("y"), bins = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((10L, 3L, 0.3, 0.2)), s"$out")
    assert(out(1L) == ((10L, 1L, 0.1, 0.2)), s"$out")
    assert(out(2L) == ((10L, 6L, 0.6, 0.6)), s"$out")
  }

  test("bradleyTerry: MM replay on a 3-model tournament; win rate would mislead") {
    // a beats b 3/4; b beats c 2/2; c beats a 1/1
    val m = Seq(("a", "b", true), ("a", "b", true), ("a", "b", true),
      ("a", "b", false), ("b", "c", true), ("b", "c", true),
      ("a", "c", false)).toDF("ma", "mb", "aw")
    val out = Analytics.bradleyTerry(m, col("ma"), col("mb"), col("aw"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("a") == ((5L, 3L, 0.45834, 1L)), s"$out")
    assert(out("b") == ((6L, 3L, 0.347655, 2L)), s"$out")
    assert(out("c") == ((3L, 1L, 0.194005, 3L)), s"$out")
    // a zero-win model sinks to exactly 0
    val z = Analytics.bradleyTerry(
      Seq(("a", "b", true), ("a", "b", true)).toDF("ma", "mb", "aw"),
      col("ma"), col("mb"), col("aw"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(z("b") == 0.0 && z("a") == 1.0, s"$z")
  }

}
