package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("checkConstraints: verdicts per class, null contracts") {
    val df = Seq(
      (Option(1L), Option(10.0), "a"),
      (Option(1L), Option(500.0), "b"),   // dup key, out of range
      (Option.empty[Long], Option(20.0), "c"), // null key
      (Option(3L), Option.empty[Double], "zz") // null value, orphan fk
    ).toDF("k", "v", "ref")
    val dim = Seq("a", "b", "c").toDF("r")
    val out = Profiling.checkConstraints(df,
        notNull = Seq("k", "v"),
        unique = Seq(Seq("k")),
        ranges = Seq(("v", 0.0, 100.0)),
        foreignKeys = Seq(("ref", dim, "r")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(out == Set(
      ("not_null(k)", 1L, false),
      ("not_null(v)", 1L, false),
      // 4 rows, 3 key groups (NULL key is its own group)
      ("unique(k)", 1L, false),
      // NULL v is not a range violation
      ("range(v)", 1L, false),
      // NULL-free orphan: "zz"
      ("fk(ref)", 1L, false)))
  }

  test("kAnonymityAudit: only sub-k classes reported, with id counts") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 3L), ("b", 3L),
      ("c", 4L)).toDF("quasi", "uid")
    val out = Profiling.kAnonymityAudit(df, Seq("quasi"), k = 3L,
        idCol = Some("uid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // class a has 3 records (>= k, passes); b has 2 (2 ids... 1 id);
    // c has 1
    assert(out == Set(("b", 2L, 1L), ("c", 1L, 1L)))
  }

  test("reconcileTotals: match, tolerance breach, missing lines") {
    val header = Seq((1L, 10.0), (2L, 5.0), (3L, 7.0)).toDF("ok", "total")
    val lines = Seq((1L, 4.0), (1L, 6.0), (2L, 5.02)).toDF("lk", "amt")
    val r = Profiling.reconcileTotals(header, lines, "ok", "lk",
      col("total"), col("amt")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((3L, 1L, 1L, 0.02)))
  }

  test("psiDrift: hand-computed shift; identical slices score zero") {
    // ref = 1..100 uniform (quartile cuts 25.75/50.5/75.25);
    // cur = 11..110 -> bin probs (.15,.25,.25,.35);
    // PSI = -0.1·ln(0.6) + 0.1·ln(1.4) = 0.08473
    val rows = (1 to 100).map(v => ("g", v.toDouble, true)) ++
      (11 to 110).map(v => ("g", v.toDouble, false))
    val out = Profiling.psiDrift(rows.toDF("grp", "v", "isRef"),
        "grp", col("isRef"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out == Seq(("g", 0.08473)))
    // identical distributions -> every term zero
    val same = (1 to 50).map(v => ("g", v.toDouble, true)) ++
      (1 to 50).map(v => ("g", v.toDouble, false))
    val z = Profiling.psiDrift(same.toDF("grp", "v", "isRef"),
      "grp", col("isRef"), "v").collect().head.getDouble(1)
    assert(z == 0.0)
  }

  test("checkConstraints: a clean table passes everything") {
    val df = Seq((1L, 5.0, "a"), (2L, 6.0, "b")).toDF("k", "v", "ref")
    val dim = Seq("a", "b").toDF("r")
    val out = Profiling.checkConstraints(df, notNull = Seq("k"),
        unique = Seq(Seq("k")), ranges = Seq(("v", 0.0, 10.0)),
        foreignKeys = Seq(("ref", dim, "r")))
      .collect()
    assert(out.length == 4 && out.forall(_.getBoolean(2)))
    assert(out.forall(_.getLong(1) == 0L))
  }

  import spark.implicits._

  test("keySkewProfile: hand-computed shares/ratios/salts, tie break at the cut") {
    // a×6, b×2, c×2, d×2 → total 12, 4 keys, mean 3
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(2)("d")).toDF("k")
    val r = Profiling.keySkewProfile(df, Seq("k"), topN = 3).collect()
    // b/c/d all tie at 2 — the cut keeps the lexicographically first two
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(r(0).getLong(1) == 6 && r(0).getDouble(2) == 0.5)
    assert(r(0).getDouble(3) == 2.0 && r(0).getLong(4) == 2)
    val third = BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1).getDouble(3) == third && r(1).getLong(4) == 1,
      s"2-count key: ratio 2/3, salt ceil = 1: ${r(1)}")
  }

  test("keySkewProfile plans a TakeOrderedAndProject, not a global sort") {
    val df = (1 to 100).map(i => s"k${i % 7}").toDF("k")
    val plan = Profiling.keySkewProfile(df, Seq("k"), topN = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"full sort:\n$plan")
  }

  test("columnProfile: nulls, distincts, numeric-only min/max, hand-checked") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(-1.0)),
      (None, Some("a"), Some(2.5)),
      (Some(2L), Some("b"), None)
    ).toDF("id", "tag", "v")
    val r = Profiling.columnProfile(df, Seq("id", "tag", "v"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          Option(x.get(4)), Option(x.get(5)))).toMap
    assert(r("id") == ((4L, 1L, 2L, Some(1.0), Some(2.0))))
    // string column: nulls+distincts profiled, min/max suppressed
    // (native string ordering is collation-sensitive across engines)
    assert(r("tag") == ((4L, 1L, 2L, None, None)))
    assert(r("v") == ((4L, 1L, 2L, Some(-1.0), Some(2.5))))
  }

  test("columnProfile is one aggregation over one scan") {
    val df = Seq((1L, "x", 1.0)).toDF("id", "tag", "v")
    val plan = Profiling.columnProfile(df, Seq("id", "tag", "v"))
      .queryExecution.optimizedPlan
    // multi-distinct plans via ONE Expand under one Aggregate chain —
    // the source leaf must appear exactly once (no per-column re-scan)
    val leaves = plan.collectLeaves()
    assert(leaves.size == 1, s"profile re-scans the input: ${leaves.size} leaves")
  }

  test("benfordAudit: digit extraction, proportions, Benford expectation") {
    // amounts chosen so leading digits are 1,1,2,9; zero/null dropped
    val df = Seq(("g", 123L), ("g", 1L), ("g", 2999L), ("g", 90L),
      ("g", 0L), ("h", 777L)).toDF("grp", "cents")
    val out = Profiling.benfordAudit(df, Seq("grp"), "cents")
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("g", 1L))._1 == 2L && out(("g", 1L))._2 == 0.5)
    assert(out(("g", 2L))._1 == 1L && out(("g", 2L))._2 == 0.25)
    assert(out(("g", 9L))._1 == 1L)
    assert(out(("h", 7L))._1 == 1L && out(("h", 7L))._2 == 1.0)
    assert(out.size == 4)
    // Benford expectation for digit 1 is log10(2) ≈ 0.30103
    assert(out(("g", 1L))._3 == 0.30103)
  }

  test("ksTwoSample: known D and location; smallest attaining value wins ties") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max |C1·n2 − C2·n1| = 8 at
    // v ∈ {2,3,4} -> D = 8/16 = 0.5, ks_at = 2 (smallest)
    val df = (Seq(1, 2, 3, 4).map(("g", "a", _)) ++
      Seq(3, 4, 5, 6).map(("g", "b", _)))
      .toDF("g", "s", "v")
    val out = Profiling.ksTwoSample(df, "g", col("s") === "a", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).head
    assert(out == (("g", 0.5, 2, 4L, 4L)))
  }

  test("ksTwoSample: identical slices D=0; disjoint slices D=1; one-slice groups dropped") {
    val same = (Seq(1.0, 2.0, 3.0).map(("g", "a", _)) ++
      Seq(1.0, 2.0, 3.0).map(("g", "b", _))).toDF("g", "s", "v")
    val d0 = Profiling.ksTwoSample(same, "g", col("s") === "a", "v")
      .collect().head
    assert(d0.getDouble(1) == 0.0)
    val disj = (Seq(1.0, 2.0).map(("g", "a", _)) ++
      Seq(5.0, 6.0).map(("g", "b", _)) ++
      Seq(("lonely", "a", 1.0))).toDF("g", "s", "v")
    val out = Profiling.ksTwoSample(disj, "g", col("s") === "a", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out == Map("g" -> ((1.0, 2.0)))) // D=1 at the last A value
  }

  test("wasserstein1: hand-computed shift; identical slices give 0") {
    // slice a = {0, 10}, slice b = {5, 15}: every point shifted +5 → W1 = 5
    val shift = (Seq(0L, 10L).map(("g", "a", _)) ++
      Seq(5L, 15L).map(("g", "b", _))).toDF("g", "s", "v")
    val w = Profiling.wasserstein1(shift, "g", col("s") === "a", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).head
    assert(w == (("g", 5.0, 2L, 2L)))
    val same = (Seq(1L, 2L, 3L).map(("g", "a", _)) ++
      Seq(1L, 2L, 3L).map(("g", "b", _))).toDF("g", "s", "v")
    val z = Profiling.wasserstein1(same, "g", col("s") === "a", "v")
      .collect().head.getDouble(1)
    assert(z == 0.0)
  }

  test("wasserstein1: groups missing a slice are dropped") {
    val df = (Seq(("g", "a", 1L), ("g", "b", 3L), ("lonely", "a", 1L)))
      .toDF("g", "s", "v")
    val out = Profiling.wasserstein1(df, "g", col("s") === "a", "v")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("g"))
  }

  test("chiSquareIndependence: hand-computed 2x2, e=15 per cell") {
    // o = [[10,20],[20,10]] -> all marginals 30, n=60, e=15
    // chi2 = 4 * (5^2/15) = 20/3
    val rows = Seq.fill(10)(("A", "x")) ++ Seq.fill(20)(("A", "y")) ++
      Seq.fill(20)(("B", "x")) ++ Seq.fill(10)(("B", "y"))
    val out = Profiling.chiSquareIndependence(rows.toDF("r", "c"), "r", "c")
      .collect().head
    assert(out.getDouble(0) == math.rint(20.0 / 3 * 1e6) / 1e6)
    assert(out.getLong(1) == 1L && out.getLong(2) == 60L)
  }

  test("chiSquareIndependence: zero-observed cells still contribute e") {
    // diagonal table [[5,0],[0,5]]: e=2.5 everywhere, chi2 = 4*2.5 = 10
    val rows = Seq.fill(5)(("A", "x")) ++ Seq.fill(5)(("B", "y"))
    val out = Profiling.chiSquareIndependence(rows.toDF("r", "c"), "r", "c")
      .collect().head
    assert(out.getDouble(0) == 10.0 && out.getLong(1) == 1L)
  }

  test("bhAdjust: hand-computed q-values with suffix-min reaching up") {
    val df = Seq((1L, 0.01), (2L, 0.04), (3L, 0.03), (4L, 0.5))
      .toDF("id", "p")
    val q = Profiling.bhAdjust(df, "id", "p")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // sorted p: .01 .03 .04 .5 -> raw p*4/j: .04 .06 .053333 .5
    // suffix-min: .04 .053333 .053333 .5
    assert(q == Map(1L -> 0.04, 3L -> 0.053333, 2L -> 0.053333, 4L -> 0.5))
  }

  test("bhAdjust: tied p's share one q; q is capped at 1") {
    val q = Profiling.bhAdjust(
        Seq((1L, 0.1), (2L, 0.1), (3L, 0.9)).toDF("id", "p"), "id", "p")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // raw: .3 .15 .9 -> ties at p=.1 both get min(.3,.15)=.15
    assert(q(1L) == 0.15 && q(2L) == 0.15 && q(3L) == 0.9)
    val capped = Profiling.bhAdjust(Seq((1L, 0.8)).toDF("id", "p"), "id", "p")
      .head().getDouble(2)
    assert(capped == 0.8)  // n=1: p*1/1, no cap needed; stays raw
  }

  // ── profileDiff (round 7) ─────────────────────────────────────────

  test("profileDiff: planted null-rate and range drift surface in the deltas") {
    import spark.implicits._
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0), (4L, "y", 4.0))
      .toDF("k", "s", "v")
    val b = Seq((Some(1L), "x", 10.0), (None, "y", 2.0), (None, "x", 3.0),
      (Some(4L), "z", 40.0)).toDF("k", "s", "v")
    val m = Profiling.profileDiff(a, b, Seq("k", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("k").getDouble(3) == 0.5, s"null rate 0 -> 1/2: ${m("k")}")
    assert(m("s").getDouble(4) == 1.5, s"2 -> 3 distinct: ${m("s")}")
    assert(m("v").getDouble(6) == 36.0, s"max 4 -> 40: ${m("v")}")
    assert(m("s").isNullAt(5) && m("s").isNullAt(6),
      "string column has no numeric range")
  }

  // ── jsDivergence / cramersV (round 7) ────────────────────────────

  test("jsDivergence: identical mixes 0, hand-computed shift, disjoint ln2") {
    import spark.implicits._
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("c", "a")
    val s = Profiling.jsDivergence(same, "c", col("a")).collect()
    assert(s.forall(_.getDouble(6) == 0.0), "identical mixes diverge by 0")
    // A = {x:2, y:2}, B = {x:1, y:3}: term_x = .5*ln(4/3)/2 + .25*ln(2/3)/2
    // = 0.021237, term_y = .5*ln(.8)/2 + .75*ln(1.2)/2 = 0.012585,
    // total 0.033822
    val shift = Seq(("x", true), ("x", true), ("y", true), ("y", true),
      ("x", false), ("y", false), ("y", false), ("y", false)).toDF("c", "a")
    val m = Profiling.jsDivergence(shift, "c", col("a"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("x").getDouble(5) == 0.021237, s"term_x: ${m("x")}")
    assert(m("y").getDouble(5) == 0.012585, s"term_y: ${m("y")}")
    assert(m("x").getDouble(6) == 0.033822, s"total: ${m("x")}")
    // fully disjoint category support -> ln 2
    val disj = Seq(("x", true), ("x", true), ("y", false), ("y", false))
      .toDF("c", "a")
    val d = Profiling.jsDivergence(disj, "c", col("a")).collect().head
    assert(d.getDouble(6) == 0.693147, s"disjoint = ln 2: $d")
  }

  test("cramersV: perfect association 1, independence 0, chi2 matches q194's") {
    import spark.implicits._
    val perfect = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L))
      .toDF("r", "c")
    val p = Profiling.cramersV(perfect, "r", "c").collect().head
    assert(p.getDouble(3) == 1.0, s"perfect: $p")
    val indep = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L)).toDF("r", "c")
    val i = Profiling.cramersV(indep, "r", "c").collect().head
    assert(i.getDouble(0) == 0.0 && i.getDouble(3) == 0.0, s"independent: $i")
    // same contingency pipeline as chiSquareIndependence: chi2 equal
    val mix = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L),
      ("b", 1L), ("c", 0L)).toDF("r", "c")
    val v = Profiling.cramersV(mix, "r", "c").collect().head
    val chi = Profiling.chiSquareIndependence(mix, "r", "c").collect().head
    assert(v.getDouble(0) == chi.getDouble(0) &&
      v.getLong(1) == chi.getLong(1), s"$v vs $chi")
  }

  test("jsShiftDaily: stable mix 0, planted flip day scores, no-history drop") {
    import spark.implicits._
    // days 1-3 balanced {x,y}; day 4 all-x
    val rows = (1L to 3L).flatMap(d => Seq((d, "x"), (d, "y"))) ++
      Seq((4L, "x"), (4L, "x"))
    val out = Profiling.jsShiftDaily(rows.toDF("day", "cat"), "cat",
        col("day"), lookback = 7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(1L), "first day has no history")
    assert(out(2L).getDouble(3) == 0.0 && out(3L).getDouble(3) == 0.0,
      s"stable days: $out")
    // day 4: p=(1,0) vs pooled q=(.5,.5), m=(.75,.25):
    // KL(p||m)/2 = ln(4/3)/2 = 0.143841;
    // KL(q||m)/2 = (.5 ln(2/3) + .5 ln 2)/2 = 0.071921 -> 0.215762
    assert(out(4L).getDouble(3) == 0.215762, s"flip day: ${out(4L)}")
    assert(out(4L).getLong(1) == 2L && out(4L).getLong(2) == 6L,
      s"day/baseline sizes: ${out(4L)}")
  }

  test("quarantine: sorted reasons, null predicate counts as violation") {
    import spark.implicits._
    val d = Seq((1L, Some(5.0), Some("x")), (2L, Some(-1.0), None),
      (3L, None, Some("x"))).toDF("id", "v", "s")
    val out = Profiling.quarantine(d, Seq(col("id")), Seq(
        "v_pos" -> (col("v") >= 0), "s_set" -> col("s").isNotNull))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) == (("", true)), s"clean row: $out")
    assert(out(2L) == (("s_set,v_pos", false)),
      s"two violations, SORTED: $out")
    // null v -> predicate NULL -> violation (unknown is not valid)
    assert(out(3L) == (("v_pos", false)), s"null predicate: $out")
  }

  test("theilsU: determined=1, independent=0, constant-Y null") {
    import spark.implicits._
    val det = Seq((0L, "a"), (0L, "a"), (1L, "b"), (1L, "b")).toDF("x", "y")
    val d = Profiling.theilsU(det, "x", "y").collect().head
    assert(d.getDouble(0) == 0.693147 && d.getDouble(1) == 0.0 &&
      d.getDouble(2) == 1.0, s"determined: $d")
    val ind = Seq((0L, "a"), (0L, "b"), (1L, "a"), (1L, "b")).toDF("x", "y")
    val i = Profiling.theilsU(ind, "x", "y").collect().head
    assert(i.getDouble(2) == 0.0, s"independent: $i")
    val const = Seq((0L, "a"), (1L, "a")).toDF("x", "y")
    val c = Profiling.theilsU(const, "x", "y").collect().head
    assert(c.getDouble(0) == 0.0 && c.isNullAt(2), s"constant y: $c")
  }

  test("fdDiscovery: holding vs violated FDs, NULL semantics") {
    val rows = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("x")), (Some(1L), None),
      (Some(2L), Some("y")),
      (Some(3L), Some("x")), (Some(3L), Some("y")), // violates a->b
      (None, Some("z"))) // null key: out of scope
      .toDF("a", "b")
    val out = Profiling.fdDiscovery(rows, Seq(("a", "b")))
      .collect().head
    assert(out.getString(0) == "a->b")
    assert(out.getLong(1) == 3, s"null key counted: $out")
    assert(out.getLong(2) == 1 && out.getLong(3) == 2, s"$out")
    assert(out.getDouble(4) == 0.333333 && !out.getBoolean(5), s"$out")
    // NULL-vs-value is not a second value: the FD still holds
    val clean = Profiling.fdDiscovery(
      rows.filter($"a".isNotNull && $"a" =!= 3L), Seq(("a", "b")))
      .collect().head
    assert(clean.getBoolean(5), s"$clean")
  }

  test("sortednessAudit: monotone 1.0, reversed 0.0, NULLs break adjacency") {
    val rows = (1L to 10L).map(i => (i, i, 11L - i,
      if (i == 5) None else Some(i))).toDF("o", "asc", "desc", "holey")
    val out = Profiling.sortednessAudit(rows, col("o"),
        Seq("asc", "desc", "holey"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("asc") == ((9L, 9L, 1.0)), s"$out")
    assert(out("desc") == ((9L, 0L, 0.0)), s"$out")
    // the null at position 5 eats BOTH adjacent pairs (4,5) and (5,6)
    assert(out("holey") == ((7L, 7L, 1.0)), s"$out")
  }

  test("syntheticRows: exact md5 rank picks, domain closure, determinism") {
    val src = Seq((1L, "p", 10L), (2L, "q", 20L), (3L, "r", 30L),
      (4L, "s", 40L), (5L, "t", 50L)).toDF("id", "a", "b")
    val out = Profiling.syntheticRows(src, "id", Seq("a", "b"), n = 20)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out.size == 20)
    // replicate the picks: rank = md5Long60("syn:<col>:<i>") % 5
    val as = Array("p", "q", "r", "s", "t"); val bs = Array(10L, 20L, 30L, 40L, 50L)
    (0L until 20L).foreach { i =>
      val ea = as((graft.functions.HashFunctions.md5Long60(s"syn:a:$i") % 5).toInt)
      val eb = bs((graft.functions.HashFunctions.md5Long60(s"syn:b:$i") % 5).toInt)
      assert(out(i) == ((ea, eb)), s"row $i: ${out(i)} vs ($ea, $eb)")
    }
    // columns drawn independently: some row must break the source's
    // perfect a<->b correlation
    assert((0L until 20L).exists { i =>
      val (a, b) = out(i); as.indexOf(a) != bs.indexOf(b) },
      "joint structure unexpectedly preserved")
    val re = Profiling.syntheticRows(src.repartition(4), "id",
        Seq("a", "b"), n = 20)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(re == out)
  }

  test("refIntegrityAudit: orphans vs null keys, rate denominator excludes nulls") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Profiling.refIntegrityAudit(child, parent, "fk", "pk", "c->p")
      .collect().head
    assert(out.getString(0) == "c->p")
    assert(out.getLong(1) == 4 && out.getLong(2) == 1 && out.getLong(3) == 1,
      s"$out")
    assert(out.getDouble(4) == 0.333333, s"rate: $out")
    // all-null child keys: rate undefined, not 0/0
    val allNull = Seq[Option[Long]](None, None).toDF("fk")
    val n = Profiling.refIntegrityAudit(allNull, parent, "fk", "pk", "x")
      .collect().head
    assert(n.getLong(3) == 0 && n.isNullAt(4), s"$n")
  }

  test("lDiversityAudit: homogeneity and skew flags, diverse class passes, NULL is a value") {
    val rows = Seq(
      // class A: 6 records, bands {1 x4, 2, 3} -> 3 distinct, top 4
      ("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L), ("A", 2L), ("A", 3L),
      // class B: 6 records, all distinct -> passes both tests
      ("B", 1L), ("B", 2L), ("B", 3L), ("B", 4L), ("B", 5L), ("B", 6L))
      .toDF("cls", "band")
    val out = Profiling.lDiversityAudit(rows, Seq("cls"), col("band"),
        l = 4L, maxSharePct = 50L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
         r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out.keySet == Set("A"), s"diverse class flagged: $out")
    assert(out("A") == ((6L, 3L, 4L, true, true)), s"$out")
    // boundary: top share exactly maxSharePct does NOT flag (strict >)
    val edge = Seq(("C", 1L), ("C", 1L), ("C", 2L), ("C", 3L))
      .toDF("cls", "band")
    assert(Profiling.lDiversityAudit(edge, Seq("cls"), col("band"),
      l = 2L, maxSharePct = 50L).collect().isEmpty)
    // NULL sensitive value counts as one distinct value
    val withNull = Seq(("D", Some(1L)), ("D", None), ("D", Some(2L)))
      .toDF("cls", "band")
    val d = Profiling.lDiversityAudit(withNull, Seq("cls"), col("band"),
      l = 4L, maxSharePct = 100L).collect().head
    assert(d.getLong(2) == 3L, s"null band not counted: $d")
  }

  test("benfordGof: exact cent digit, zero-digit rows kept, sub-cent/negative/null excluded") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pc = 100, 1999, 250, 30000 → digits 1,1,2,3; 0.004 (pc=0),
    // −5 and NULL excluded → N = 4
    val df = Seq(Some(1.0), Some(19.99), Some(2.5), Some(300.0),
      Some(0.004), Some(-5.0), None).toDF("v")
    val out = Profiling.benfordGof(df, col("v")).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.size == 9)
    assert(out(1).getLong(1) == 2L && out(1).getDouble(2) == 0.5)
    assert(out(2).getLong(1) == 1L && out(2).getDouble(2) == 0.25)
    val p1 = 0.301029995664
    val dev1 = 2.0 - 4 * p1
    assert(out(1).getDouble(4) == r6(dev1 * dev1 / (4 * p1)), s"${out(1)}")
    // zero-observation digit: χ² term = N·p
    assert(out(9).getLong(1) == 0L &&
      out(9).getDouble(4) == r6(4 * 0.045757490561), s"${out(9)}")
    assert(out(1).getDouble(3) == 0.30103)
  }

  test("cramerVonMises: hand-computed level terms; identical slices 0; ties one level") {
    import spark.implicits._
    // A {1,2} vs B {1,3}: only v=2 contributes (4-2)^2 = 4
    // -> T = 4 / (2*2*16) = 0.0625; the v=1 tie is a single level
    val df = Seq(("g", "a", 1L), ("g", "a", 2L), ("g", "b", 1L),
      ("g", "b", 3L)).toDF("g", "s", "v")
    val out = Profiling.cramerVonMises(df, "g", col("s") === "a", "v").head()
    assert((out.getLong(1), out.getLong(2), out.getDouble(3)) ==
      ((2L, 2L, 0.0625)), s"$out")
    val same = Profiling.cramerVonMises(
      Seq(("g", "a", 5L), ("g", "b", 5L), ("g", "a", 7L), ("g", "b", 7L))
        .toDF("g", "s", "v"), "g", col("s") === "a", "v").head()
    assert(same.getDouble(3) == 0.0, s"$same")
    // groups missing a slice are dropped
    val one = Profiling.cramerVonMises(
      Seq(("g", "a", 1L)).toDF("g", "s", "v"), "g", col("s") === "a", "v")
    assert(one.isEmpty)
  }

  test("chiSquareResiduals: hand 2x2 with an empty cell included") {
    import spark.implicits._
    // diagonal 2x2 with two empty cells: E = 1 everywhere,
    // residuals +-2.0, none past the 99% z
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val out = Profiling.chiSquareResiduals(df, "r", "c")
      .collect().map(rr => (rr.getString(0), rr.getString(1)) -> rr).toMap
    assert(out.size == 4, s"$out")
    val ax = out(("a", "x"))
    assert(ax.getLong(2) == 2L && ax.getDouble(3) == 1.0 &&
      ax.getDouble(4) == 2.0 && !ax.getBoolean(5), s"$ax")
    val ay = out(("a", "y"))
    assert(ay.getLong(2) == 0L && ay.getDouble(4) == -2.0, s"$ay")
  }

  test("tClosenessAudit: hand-computed EMD vs global; constant column NULL") {
    import spark.implicits._
    // A {1,1,2}, B {2,3,3}: global CDF (1/3, 2/3, 1); A's (2/3, 1, 1)
    // -> Σ|ΔF| = 2/3 over m-1 = 2 steps -> T = 1/3 for both classes
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L),
      ("B", 2L), ("B", 3L), ("B", 3L)).toDF("qp", "v")
    val out = Profiling.tClosenessAudit(df, Seq("qp"), col("v"), t = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out("A") == ((3L, 0.333333, true)), s"$out")
    assert(out("B") == ((3L, 0.333333, true)), s"$out")
    val loose = Profiling.tClosenessAudit(df, Seq("qp"), col("v"), t = 0.4)
      .collect()
    assert(loose.forall(!_.getBoolean(3)), s"${loose.mkString}")
    // constant sensitive column: m = 1, EMD undefined
    val const = Profiling.tClosenessAudit(
      Seq(("A", 5L), ("B", 5L)).toDF("qp", "v"), Seq("qp"), col("v"), 0.2)
      .collect()
    assert(const.forall(_.isNullAt(2)), s"${const.mkString}")
  }

  test("indDiscovery: containment is directional; zero-overlap pairs appear") {
    val child = Seq(1L, 2L, 2L, 3L).toDF("fk")       // {1,2,3}
    val parent = Seq(1L, 2L, 3L, 4L, 5L).toDF("pk")  // {1..5}
    val other = Seq(9L, 10L).toDF("x")               // disjoint
    val out = Profiling.indDiscovery(Seq(
        "child.fk" -> child, "parent.pk" -> parent, "other.x" -> other))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size == 6, s"$out")
    assert(out(("child.fk", "parent.pk")) == ((3L, 3L, true)), s"$out")
    assert(out(("parent.pk", "child.fk")) == ((5L, 3L, false)), s"$out")
    assert(out(("child.fk", "other.x")) == ((3L, 0L, false)), s"$out")
    assert(out(("other.x", "parent.pk")) == ((2L, 0L, false)), s"$out")
  }
}
