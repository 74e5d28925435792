package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the round-6 curation operators: the leakage property that
  * motivates cluster-aware splitting, DSIR's determinism/degeneracy
  * contract, and the quality gate's edge inputs (SURVEY §2.11;
  * VERDICT r6 next-round item 1). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1L to n.toLong).map(i => (i, s"doc text number $i with the filler words"))
      .toDF("doc_id", "text")

  // ── clusterSplit ──────────────────────────────────────────────────

  test("clusterSplit: a near-dup pair NEVER straddles train/val") {
    // chain 1-2-3 and pair 10-11 are clusters; rest are singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val d = docs(40)
    // any valFraction must keep every pair co-assigned — the property
    // holds by construction (one decision per cluster rep), so probe
    // several fractions to make a regression loud
    for (f <- Seq(0.1, 0.3, 0.5, 0.9)) {
      val split = Curation.clusterSplit(d, pairs, valFraction = f)
      val straddled = split.join(pairs, split("doc_id") === pairs("doc_a"))
        .select(col("split").as("s_a"), col("doc_b"))
        .join(split.select(col("doc_id").as("doc_b"), col("split").as("s_b")),
          Seq("doc_b"))
        .filter(col("s_a") =!= col("s_b"))
        .count()
      assert(straddled == 0, s"near-dup pair straddles split at f=$f")
    }
  }

  test("clusterSplit: transitive closure co-assigns the whole chain") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val split = Curation.clusterSplit(docs(5), pairs)
    assert(split.select("split").distinct().count() == 1,
      "a connected chain must land in exactly one split")
  }

  test("clusterSplit: valFraction bounds respected at the extremes") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val all = Curation.clusterSplit(docs(50), pairs, valFraction = 0.0)
    assert(all.filter(col("split") === "val").count() == 0)
    val none = Curation.clusterSplit(docs(50), pairs, valFraction = 1.0)
    assert(none.filter(col("split") === "train").count() == 0)
  }

  // ── dsirSample ────────────────────────────────────────────────────

  test("dsirSample: k respected and deterministic across partitionings") {
    val corpus = docs(60)
    val target = (1L to 10L)
      .map(i => (i, s"target domain text $i about spark engines"))
      .toDF("doc_id", "text")
    val a = Curation.dsirSample(corpus, target, k = 15)
      .collect().map(_.toString).toSeq
    assert(a.size == 15)
    val b = Curation.dsirSample(corpus.repartition(7), target.repartition(3),
        k = 15).collect().map(_.toString).toSeq
    assert(a == b, "resample must be invariant to physical partitioning")
  }

  test("dsirSample: target ≡ corpus ⇒ every logratio is 0") {
    val corpus = docs(30)
    val out = Curation.dsirSample(corpus, corpus, k = 30)
    assert(out.count() == 30)
    assert(out.filter(col("logratio") =!= 0.0).count() == 0,
      "identical target and corpus LMs must give log-ratio 0 everywhere")
  }

  test("dsirSample: on-domain documents carry strictly higher logratio") {
    // corpus has 5 docs about 'quantum flux' and 45 generic docs; the
    // SELECTION is stochastic by design (Gumbel-perturbed), but the
    // importance WEIGHT is deterministic: on-domain docs must score
    // a positive logratio and generic docs (no target-vocab token)
    // exactly 0
    val onDomain = (1L to 5L).map(i => (i, "quantum flux manifold paper"))
    val generic = (6L to 50L).map(i => (i, s"generic filler document d$i"))
    val corpus = (onDomain ++ generic).toDF("doc_id", "text")
    val target = Seq((100L, "quantum flux manifold study"))
      .toDF("doc_id", "text")
    val scored = Curation.dsirSample(corpus, target, k = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1L to 5L).foreach(i => assert(scored(i) > 0.5, s"doc $i: ${scored(i)}"))
    (6L to 50L).foreach(i => assert(scored(i) == 0.0, s"doc $i: ${scored(i)}"))
  }

  // ── qualityLogit ──────────────────────────────────────────────────

  test("qualityLogit: empty and degenerate text score without NaN/null") {
    val weird = Seq(
      (1L, ""), (2L, "   "), (3L, "!!!???"), (4L, "a"),
      (5L, "the of and a normal looking english sentence with words"))
      .toDF("doc_id", "text")
    val out = Curation.qualityLogit(weird).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val s = r.getDouble(1)
      assert(!s.isNaN && s >= 0.0 && s <= 1.0, s"score out of range: $r")
      assert(!r.isNullAt(2), s"keep flag null: $r")
    }
  }

  test("qualityLogit: stopword-dense prose outranks symbol soup") {
    val d = Seq(
      (1L, "the cat sat on the mat and then the dog came along too"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____"))
      .toDF("doc_id", "text")
    val m = Curation.qualityLogit(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) > m(2L))
  }

  test("qualityLogit: gate compares the rounded score") {
    val d = docs(20)
    val out = Curation.qualityLogit(d, threshold = 0.5).collect()
    out.foreach { r =>
      assert(r.getBoolean(2) == (r.getDouble(1) >= 0.5),
        s"keep flag must derive from the ROUNDED score: $r")
    }
  }

  // ── dedupWeights ──────────────────────────────────────────────────

  test("dedupWeights: weights sum to the cluster count; singletons weigh 1") {
    // clusters {1,2,3}, {10,11}, singletons 4..9
    val resolved = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (4L, 4L), (5L, 5L), (6L, 6L), (7L, 7L), (8L, 8L), (9L, 9L))
      .toDF("doc_id", "cluster_rep")
    val out = Curation.dedupWeights(resolved)
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getDouble(2), r.getBoolean(3))).toMap
    assert(m(1L) == ((0.333333, true)) && m(2L) == ((0.333333, false)))
    assert(m(10L) == ((0.5, true)) && m(11L) == ((0.5, false)))
    assert(m(4L) == ((1.0, true)))
    // one document's worth of weight per cluster (rounding aside)
    val total = out.agg(sum("weight")).head().getDouble(0)
    assert(math.abs(total - 8.0) < 1e-3, s"weight mass $total != 8 clusters")
  }

  // ── budgetSample ──────────────────────────────────────────────────

  test("budgetSample: takes best-score docs until the stratum budget") {
    val d = Seq(
      ("a", 1L, 40L, 0.9), ("a", 2L, 40L, 0.8), ("a", 3L, 40L, 0.7),
      ("b", 4L, 100L, 0.5), ("b", 5L, 10L, 0.99))
      .toDF("src", "doc_id", "cost", "score")
    val out = Curation.budgetSample(d, "src", "cost", "score", budget = 90L)
      .select("doc_id").as[Long].collect().toSet
    // stratum a: 0.9 (40) + 0.8 (80) fit, 0.7 (120) does not;
    // stratum b: 0.99 (10) fits, then 0.5 pushes cum to 110 > 90
    assert(out == Set(1L, 2L, 5L), s"got $out")
  }

  test("budgetSample: cut is stable under repartitioning") {
    val d = (1L to 200L).map(i =>
      (s"s${i % 3}", i, 10L + i % 7, (i % 13).toDouble))
      .toDF("src", "doc_id", "cost", "score")
    val a = Curation.budgetSample(d, "src", "cost", "score", 300L)
      .collect().map(_.toString).sorted.toSeq
    val b = Curation.budgetSample(d.repartition(7), "src", "cost", "score", 300L)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  // ── contaminationReport ───────────────────────────────────────────

  test("contaminationReport: exact copies flag on all tiers, disjoint text on none") {
    // corpus: 2 docs copied verbatim from the benchmark + 3 docs of
    // unrelated long text (13-gram and near-dup tiers need length)
    val bench = Seq(
      (100L, ("alpha beta gamma delta " * 8).trim),
      (101L, ("epsilon zeta eta theta " * 8).trim))
      .toDF("doc_id", "text")
    val clean = Seq(
      (1L, ("one two three four five six seven eight nine ten " * 4).trim),
      (2L, ("red orange yellow green blue indigo violet pink brown black " * 4).trim),
      (3L, ("north south east west up down left right front back " * 4).trim))
      .toDF("doc_id", "text")
    val corpus = bench.union(clean)
    val m = Curation.contaminationReport(corpus, bench)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("exact" -> 2L, "ngram" -> 2L, "neardup" -> 2L), s"got $m")
  }

  // ── calibrationReport / clusterSizeHistogram / balancedShards ─────

  test("calibrationReport: perfect calibration has zero ECE; bins clamp") {
    // scores equal to the empirical label rate in each bin
    val rows = (1 to 100).map { i =>
      val s = if (i <= 50) 0.25 else 0.75
      (i.toLong, s, if (i <= 50) i % 4 == 0 else i % 4 != 0)
    }.toDF("id", "score", "y")
    val out = Curation.calibrationReport(rows, "score", "y", bins = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5))).toMap
    // bin 1: score .25, rate 12/50 close but not exact -> ece term > 0
    assert(out.keySet == Set(1L, 3L))
    // score exactly 1.0 must land in the top bin, not bin==bins
    val edge = Seq((1L, 1.0, true)).toDF("id", "score", "y")
    val e = Curation.calibrationReport(edge, "score", "y", bins = 4)
      .collect().head
    assert(e.getLong(0) == 3L, s"score 1.0 clamps to top bin: $e")
    assert(e.getDouble(5) == 0.0, "single perfect point has zero gap")
  }

  test("calibrationReport: ECE terms weight by bin mass and sum sanely") {
    val rows = (1 to 200).map(i =>
      (i.toLong, (i % 10) / 10.0 + 0.05, i % 3 == 0)).toDF("id", "score", "y")
    val out = Curation.calibrationReport(rows, "score", "y").collect()
    val ece = out.map(_.getDouble(5)).sum
    assert(ece >= 0.0 && ece <= 1.0, s"ECE out of range: $ece")
    assert(out.map(_.getLong(1)).sum == 200, "bin counts partition the data")
  }

  test("clusterSizeHistogram: histogram of planted cluster sizes") {
    val resolved = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),          // size 3
      (10L, 10L), (11L, 10L),                 // size 2
      (20L, 20L), (21L, 21L), (22L, 22L))     // three singletons
      .toDF("doc_id", "cluster_rep")
    val m = Curation.clusterSizeHistogram(resolved).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(3L -> 1L, 2L -> 1L, 1L -> 3L), s"got $m")
  }

  test("balancedShards: near-equal fills, deterministic, all docs assigned") {
    val docs = (1L to 97L).map(i => (i, 10L + (i % 13) * 7))
      .toDF("doc_id", "n_chars")
    val out = Curation.balancedShards(docs, "n_chars", shards = 4)
    assert(out.count() == 97)
    val fills = out.groupBy("shard").agg(sum("n_chars").as("f"))
      .collect().map(_.getLong(1))
    assert(fills.length == 4)
    // LPT round-robin on this near-uniform size mix: within 15%
    assert(fills.max - fills.min <= fills.max / 5,
      s"imbalanced fills: ${fills.toSeq}")
    val a = Curation.balancedShards(docs.repartition(7), "n_chars", 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == out.collect().map(_.toString).sorted.toSeq)
  }

  // ── quantileBins ──────────────────────────────────────────────────

  test("quantileBins: fit on train, apply to serve — bins don't re-rank") {
    val train = (1L to 100L).map(i => (i, i)).toDF("doc_id", "v")
    val serve = Seq((900L, 0L), (901L, 5L), (902L, 55L), (903L, 999L))
      .toDF("doc_id", "v")
    val out = Curation.quantileBins(train, serve, "v", bins = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // cutoffs at 10,20,...,90: 0 -> bin 0, 5 -> 0, 55 -> 5, 999 -> 9
    assert(out == Map(900L -> 0, 901L -> 0, 902L -> 5, 903L -> 9), s"$out")
  }

  test("quantileBins: applying the fit to itself gives near-equal bins") {
    val d = (1L to 1000L).map(i => (i, (i * 7919) % 1000)).toDF("doc_id", "v")
    val out = Curation.quantileBins(d, d, "v", bins = 10)
    val sizes = out.groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 to 9).toSet, s"$sizes")
    assert(sizes.values.forall(n => n >= 90 && n <= 110), s"$sizes")
  }

  test("quantileBins: deterministic under repartitioning") {
    val d = (1L to 500L).map(i => (i, (i % 37) * 3)).toDF("doc_id", "v")
    val a = Curation.quantileBins(d, d, "v").collect()
      .map(_.toString).sorted.toSeq
    val b = Curation.quantileBins(d.repartition(9), d.repartition(4), "v")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  // ── outputManifest (round 7) ─────────────────────────────────────

  test("outputManifest: order-free checksum, tamper detection, exact counts") {
    import spark.implicits._
    val d = Seq((1L, 0, "alpha", 5L), (2L, 0, "beta", 4L),
      (3L, 1, "gamma", 5L)).toDF("id", "shard", "text", "cost")
    val m = Curation.outputManifest(d, "shard", "id", col("text"), "cost")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(0)._1 == 2L && m(0)._2 == 9L && m(1)._1 == 1L, s"counts: $m")
    // same rows, any order/partitioning -> identical checksums
    val m2 = Curation.outputManifest(d.orderBy(col("id").desc)
        .repartition(5), "shard", "id", col("text"), "cost")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(m.view.mapValues(_._3).toMap == m2, "checksum is order-free")
    // one payload byte flips -> that shard's checksum moves
    val tampered = Seq((1L, 0, "alphA", 5L), (2L, 0, "beta", 4L),
      (3L, 1, "gamma", 5L)).toDF("id", "shard", "text", "cost")
    val mt = Curation.outputManifest(tampered, "shard", "id", col("text"),
        "cost")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(mt(0) != m(0)._3 && mt(1) == m(1)._3,
      "tamper moves only the touched shard's checksum")
  }

  // ── onehotVocab / standardScaler (round 7) ───────────────────────

  test("onehotVocab: freq-then-name order, OTHER for tail/unseen/null") {
    import spark.implicits._
    val fit = Seq("a", "a", "a", "b", "b", "c", "d")
      .zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("doc_id", "cat")
    val apply = Seq((10L, "a"), (11L, "b"), (12L, "c"), (13L, "d"),
      (14L, "e"), (15L, null.asInstanceOf[String])).toDF("doc_id", "cat")
    val out = Curation.onehotVocab(fit, apply, "cat", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out(10L) == ((0L, false)), s"a most frequent: $out")
    assert(out(11L) == ((1L, false)), s"b second: $out")
    assert(out(12L) == ((2L, false)), s"c beats d on the name tiebreak: $out")
    assert(out(13L) == ((3L, true)), s"d fell off the vocabulary: $out")
    assert(out(14L) == ((3L, true)), s"unseen at serve time: $out")
    assert(out(15L) == ((3L, true)), s"null category is OTHER: $out")
  }

  test("onehotVocab: vocabulary comes from fit, never from apply") {
    import spark.implicits._
    val fit = Seq((1L, "x")).toDF("doc_id", "cat")
    // 'y' dominates the APPLY slice but must still be OTHER
    val apply = (1L to 50L).map(i => (i, "y")).toDF("doc_id", "cat")
    val out = Curation.onehotVocab(fit, apply, "cat", k = 2).collect()
    assert(out.forall(r => r.getLong(2) == 2L && r.getBoolean(3)))
  }

  test("standardScaler: hand-computed z from the fit slice; degenerate null") {
    import spark.implicits._
    // fit {1,2,3}: mu=200c, sample sd=100c -> z(4.0)=2, z(2.0)=0
    val fit = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v")
    val apply = Seq((10L, 4.0), (11L, 2.0), (12L, 0.0)).toDF("id", "v")
    val out = Curation.standardScaler(fit, apply, "v", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) == 2.0 && out(11L) == 0.0 && out(12L) == -2.0,
      s"z-scores: $out")
    // constant fit slice: sd = 0 -> null, not Inf
    val const = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v")
    val c = Curation.standardScaler(const, apply, "v", "id").collect()
    assert(c.forall(_.isNullAt(2)), "zero-variance fit yields null z")
  }

  test("mondrianConformal: boundary p-values, tie order, per-class isolation") {
    // class c: calibration nonconformities 0.1 .. 0.9 (n_cal = 9)
    val cal = ((1 to 9).map(i => ("c", i / 10.0, i.toLong)) ++
      Seq(("d", 0.5, 100L))).toDF("cls", "a", "id")
    // p = (1 + #{cal >= a}) / 10; covered iff p > 0.1
    val test = Seq(
      ("c", 0.05, 201L), // cnt 9 -> p = 1.0  covered
      ("c", 0.85, 202L), // cnt 1 -> p = 0.2  covered
      ("c", 0.95, 203L), // cnt 0 -> p = 0.1  NOT covered (strict >)
      ("c", 0.9, 204L),  // tie: cal-first -> cnt 1 -> p 0.2 covered
      ("d", 0.4, 205L))  // other class: its own 1-row calibration
      .toDF("cls", "a", "id")
    val out = Curation.mondrianConformal(cal, test, "cls", col("a"),
        col("id"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("c") == ((9L, 4L, 3L, 0.75)), s"$out")
    // class d: cnt 1 -> p = 2/2 = 1 > 0.1 covered
    assert(out("d") == ((1L, 1L, 1L, 1.0)), s"$out")
  }

  test("dedupPressure: planted re-crawl bucket spikes, fingerprint normalization") {
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta"),
      (2L, "epsilon zeta"), (3L, "eta theta"),
      (4L, "ALPHA   beta"), // ws/case variant of 0 -> duplicate
      (5L, "gamma delta")).toDF("doc_id", "text")
    val out = Curation.dedupPressure(docs, bucket = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out(0L) == ((2L, 0L, 0.0, 2L)), s"$out")
    assert(out(1L) == ((2L, 0L, 0.0, 4L)), s"$out")
    // the re-crawl bucket: everything is a duplicate of the past
    assert(out(2L) == ((2L, 2L, 1.0, 4L)), s"$out")
  }

  test("domainReweight: hard domain gains weight, identical domains keep shares") {
    // easy: high-frequency words; hard: rare words -> higher loss
    val docs = (
      (1 to 8).map(i => (i.toLong, "easy", "the the the and and of")) ++
      Seq((100L, "hard", s"zqx${1} vvk${2} wpj${3} qqy${4} rrz${5} ssx${6}")))
      .toDF("doc_id", "source", "text")
    val out = Curation.domainReweight(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out("hard")._2 > out("easy")._2, s"loss order: $out")
    assert(out("hard")._3 > 0.0 && out("easy")._3 == 0.0, s"excess: $out")
    // hard has 6 of 54 tokens (~0.111 share) but must exceed its share
    assert(out("hard")._4 > 6.0 / 54.0, s"weight vs share: $out")
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 2e-6, "sums to 1")
    // identical distributions: zero excess, weights = token shares
    val flat = Seq((1L, "a", "x y z"), (2L, "b", "x y z"), (3L, "b", "x y z"))
      .toDF("doc_id", "source", "text")
    val f = Curation.domainReweight(flat)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(f("a")._1 == 0.0 && f("b")._1 == 0.0, s"$f")
    assert(f("a")._2 == 0.333333 && f("b")._2 == 0.666667, s"$f")
  }

  test("sourceDuplicationMatrix: intra/cross-source cells, singletons silent") {
    val resolved = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 5L), (6L, 5L)).toDF("doc_id", "cluster_rep")
    val docs = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "C"),
      (5L, "A"), (6L, "B")).toDF("doc_id", "source")
    val out = Curation.sourceDuplicationMatrix(resolved, docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // cluster 1 contributes (A,A) once (docs 1&3) and (A,B) once
    // (deduped across the 1-2 and 3-2 pairs); cluster 5 adds (A,B)
    assert(out == Map(("A", "A") -> 1L, ("A", "B") -> 2L), s"$out")
  }

  test("quantileNormalize: hand-mapped ranks, identity on one group, singleton to median") {
    val rows = Seq((1L, "X", 10L), (2L, "X", 30L),
      (3L, "Y", 0L), (4L, "Y", 20L), (5L, "Y", 40L))
      .toDF("doc_id", "source", "v")
    val out = Curation.quantileNormalize(rows, "source", col("v"), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // global sorted reference: 0,10,20,30,40 (ranks 1..5)
    // X (ns=2): r1 -> k1 -> 0; r2 -> k5 -> 40 (endpoints map to endpoints)
    assert(out(1L) == ((10L, 0L)) && out(2L) == ((30L, 40L)), s"$out")
    // Y (ns=3): quartile positions 0, 1/2, 1 -> ranks 1, 3, 5
    assert(out(3L) == ((0L, 0L)) && out(4L) == ((20L, 20L)) &&
      out(5L) == ((40L, 40L)), s"$out")
    // one group: normalization is the identity
    val one = Curation.quantileNormalize(rows.withColumn("source", lit("S")),
        "source", col("v"), "doc_id")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(one.forall(t => t._1 == t._2), s"identity broken: ${one.toSeq}")
    // singleton group maps to the global median rank
    val withSingleton = rows.union(
      Seq((9L, "Z", 999L)).toDF("doc_id", "source", "v"))
    val z = Curation.quantileNormalize(withSingleton, "source", col("v"),
        "doc_id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // N=6: k = 1 + (6-1) div 2 = 3 -> third-smallest global value (20)
    assert(z(9L) == 20L, s"singleton: $z")
  }

  test("filterDisparity: rates, reference group, NULL group/kept handling") {
    import spark.implicits._
    val rows = Seq(
      ("A", Some(true)), ("A", Some(true)), ("A", Some(true)), ("A", Some(true)),
      ("B", Some(true)), ("B", Some(true)), ("B", Some(false)), ("B", Some(false)),
      ("C", Some(false)), ("C", Option.empty[Boolean]), // NULL kept = dropped
      (null.asInstanceOf[String], Some(true)))          // NULL group excluded
      .toDF("src", "keep")
    val out = Curation.filterDisparity(rows, "src", col("keep"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out == Map(
      "A" -> ((4L, 4L, 1.0, Some(1.0))),
      "B" -> ((4L, 2L, 0.5, Some(0.5))),
      "C" -> ((2L, 0L, 0.0, Some(0.0)))), s"$out")
    // a gate that keeps nothing anywhere: ratios are NULL, not 0/0
    val dead = Curation.filterDisparity(rows, "src", lit(false))
      .collect().map(r => r.isNullAt(4))
    assert(dead.forall(identity), "all-zero gate must yield NULL ratios")
  }

  test("brierDecomposition: hand-computed Murphy terms; identity holds bin-constant") {
    // bins=2: bin0 p̄=0.2 ō=1/3, bin1 p̄=0.8 ō=2/3 -> brier 0.24,
    // unc 0.25, rel 0.017778, res 0.027778 (0.25+rel-res = brier:
    // forecasts constant per bin, so the identity is exact)
    val df = Seq((0.2, false), (0.2, false), (0.2, true),
      (0.8, true), (0.8, true), (0.8, false)).toDF("s", "y")
    val out = Curation.brierDecomposition(df, "s", "y", bins = 2).head()
    assert(out.getLong(0) == 6L && out.getDouble(1) == 0.5, s"$out")
    assert(out.getDouble(2) == 0.24 && out.getDouble(3) == 0.25, s"$out")
    assert(out.getDouble(4) == 0.017778 && out.getDouble(5) == 0.027778,
      s"$out")
    // perfectly calibrated constant forecast: rel 0, res 0, brier=unc
    val flat = Curation.brierDecomposition(
      Seq((0.5, true), (0.5, false)).toDF("s", "y"), "s", "y", bins = 2)
      .head()
    assert(flat.getDouble(4) == 0.0 && flat.getDouble(5) == 0.0 &&
      flat.getDouble(2) == flat.getDouble(3), s"$flat")
  }

  test("effectiveTokens: duplicate mass discounts; singleton keeps full weight") {
    // s1: two identical 3-token docs in one cluster -> eff 3, discount .5
    val docs = Seq((1L, "a b c", "s1"), (2L, "a b c", "s1"),
      (3L, "x y", "s2")).toDF("doc_id", "text", "source")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("doc_id", "cluster_rep")
    val out = Curation.effectiveTokens(docs, clusters, "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("s1") == ((2L, 6L, 3.0, 0.5)), s"$out")
    assert(out("s2") == ((1L, 2L, 2.0, 0.0)), s"$out")
  }

  test("datasetCard: one-row rollup with hand-checkable integer facts") {
    val docs = Seq((1L, "alpha beta", "en"), (2L, "alpha", "en"),
      (3L, "", "de"), (4L, null, null))
      .toDF("doc_id", "text", "lang")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "cluster_rep")
    val out = Curation.datasetCard(docs, clusters).head()
    assert((out.getLong(0), out.getLong(1)) == ((4L, 3L)), s"$out")
    assert(out.getDouble(2) == 0.75, s"$out")
    assert(out.getLong(3) == 2L && out.getString(4) == "en", s"$out")
    assert(out.getDouble(5) == 0.666667 && out.getDouble(6) == 0.5, s"$out")
    val mq = out.getDouble(7)
    assert(mq > 0.0 && mq < 1.0, s"$out")
    assert(out.getDouble(8) == 0.25, s"$out")
  }

  test("ipfRake: both weighted marginals land on the reference shares") {
    // corpus 6/2/2/2 over (lang, source); reference marginals
    // en:fr = 1:1 and web:book = 5:3 -> quantized IPF replay (3
    // rounds) converges exactly on this well-conditioned table
    val corpus = (Seq.fill(6)(("en", "web")) ++ Seq.fill(2)(("en", "book")) ++
      Seq.fill(2)(("fr", "web")) ++ Seq.fill(2)(("fr", "book")))
      .toDF("lang", "source")
    val ref = (Seq.fill(2)(("en", "web")) ++ Seq.fill(2)(("en", "book")) ++
      Seq.fill(3)(("fr", "web")) ++ Seq.fill(1)(("fr", "book")))
      .toDF("lang", "source")
    val out = Curation.ipfRake(corpus, ref, "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("en", "web")) == ((6L, 0.75, 4.5)), s"$out")
    assert(out(("en", "book")) == ((2L, 0.75, 1.5)), s"$out")
    assert(out(("fr", "web")) == ((2L, 1.5, 3.0)), s"$out")
    assert(out(("fr", "book")) == ((2L, 1.5, 3.0)), s"$out")
    // achieved marginals == expected counts (N=12: en 6, web 7.5)
    val m1 = out.toSeq.groupBy(_._1._1)
      .map { case (k, v) => k -> v.map(_._2._3).sum }
    assert(m1 == Map("en" -> 6.0, "fr" -> 6.0), s"$m1")
  }
}
