package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val docs = (1L to 2000L).map(i => (i, s"document number $i content")).toDF("doc_id", "text")

  test("hashSample keeps ~fraction of rows, deterministically across partitionings") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample depends on partitioning")
    assert(math.abs(a.size / 2000.0 - 0.2) < 0.05, s"kept ${a.size} of 2000")
  }

  test("weightedSample: uniform weights reduce to hashSample; clamp and zero-weight laws") {
    val df = (1 to 2000).map(i => (i.toLong, 10L)).toDF("id", "w")
    // equal weights => p = rate everywhere => EXACTLY hashSample
    val ws = Sampling.weightedSample(df, $"w", $"id", 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    val hs = Sampling.hashSample(df, $"id", 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ws == hs, "uniform-weight sample must equal the unweighted hash sample")
    // zero weight -> p = 0 -> never kept; huge weight -> p clamps 1 -> always kept
    val mixed = Seq((1L, 0L), (2L, 0L), (3L, 1000000L), (4L, 1L))
      .toDF("id", "w")
    val kept = Sampling.weightedSample(mixed, $"w", $"id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(2L), s"zero-weight row kept: $kept")
    assert(kept.contains(3L), s"p=1 row dropped: $kept")
    // expected kept fraction tracks rate on realistic skewed weights
    val skewed = (1 to 2000).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "w")
    val frac = Sampling.weightedSample(skewed, $"w", $"id", 0.5).count() / 2000.0
    assert(math.abs(frac - 0.5) < 0.05, s"kept fraction $frac")
  }

  test("trainValSplit partitions every row; subsets nest as fraction grows") {
    val split = Sampling.trainValSplit(docs, col("doc_id"), 0.1)
    assert(split.count() == 2000)
    val vals = split.filter($"split" === "val").collect().map(_.getLong(0)).toSet
    val vals2 = Sampling.trainValSplit(docs, col("doc_id"), 0.3)
      .filter($"split" === "val").collect().map(_.getLong(0)).toSet
    assert(vals.subsetOf(vals2), "10% val set not nested in 30% val set")
  }

  test("decontaminate drops exact and whitespace/case-variant matches only") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "THE  quick   brown FOX"), // fingerprint-equal variant of 1
      (3L, "completely unrelated text")).toDF("doc_id", "text")
    val benchmark = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val clean = Sampling.decontaminate(corpus, benchmark)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L))
  }

  test("ngramDecontaminate: any shared 13-gram drops the doc, 12 does not") {
    val bench = Seq((100L, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // 13 consecutive benchmark tokens (t3..t15) → contaminated
      (1L, "alpha " + (3 to 15).map(i => s"t$i").mkString(" ") + " omega"),
      // only 12 consecutive (t3..t14) → clean
      (2L, "alpha " + (3 to 14).map(i => s"t$i").mkString(" ") + " omega"),
      (3L, "completely unrelated words " + (1 to 20).map(i => s"u$i").mkString(" ")),
      (4L, "too short to have any 13gram")).toDF("doc_id", "text")
    val clean = Sampling.ngramDecontaminate(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L, 4L))
  }

  test("weightedRepeat: floor + fractional hash copies, zero-weight drop, determinism") {
    val rows = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "junk"))
    val df = rows.toDF("id", "lang")
    val out = Sampling.weightedRepeat(df, col("lang"), col("id"),
      Map("en" -> 0.5, "zh" -> 2.3, "junk" -> 0.0))
    val counts = out.groupBy("id", "lang").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // per-doc copy counts land on ⌊w⌋ or ⌊w⌋+1; zero-weight vanishes
    assert(counts.forall {
      case (_, "en", c) => c == 1
      case (_, "zh", c) => c == 2 || c == 3
      case _ => false
    })
    assert(!counts.exists(_._2 == "junk"))
    // hash-binomial expectations (1000 docs per stratum, wide bands)
    val enKept = counts.count(_._2 == "en")
    assert(enKept > 380 && enKept < 620, s"en kept $enKept of 1000")
    val zh3 = counts.count(c => c._2 == "zh" && c._3 == 3L)
    assert(zh3 > 180 && zh3 < 420, s"zh triples $zh3 of 1000")
    // expected mixture size 0.5·1000 + 2.3·1000 = 2800
    val total = out.count()
    assert(total > 2550 && total < 3050, s"mixture size $total")
    // deterministic under a different partitioning
    val again = Sampling.weightedRepeat(df.repartition(7), col("lang"), col("id"),
      Map("en" -> 0.5, "zh" -> 2.3, "junk" -> 0.0))
    assert(again.orderBy("id", "copy_idx").collect().map(_.toSeq).toSeq ==
      out.orderBy("id", "copy_idx").collect().map(_.toSeq).toSeq)
  }

  test("temperatureMixture: n^alpha law — tail upsampled, head downsampled, size preserved") {
    // head: 800 docs of "big", tail: 50 of "small" → alpha=0.5 weights
    // w = N·n^(-1/2)/Z with N=850, Z=sqrt(800)+sqrt(50)
    val df = ((1 to 800).map(i => (i.toLong, "big")) ++
      (1001 to 1050).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val out = Sampling.temperatureMixture(df, col("lang"), col("doc_id"), 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = math.sqrt(800.0) + math.sqrt(50.0)
    val wBig = 850.0 * math.sqrt(800.0) / (z * 800.0)   // ≈ 0.68
    val wSmall = 850.0 * math.sqrt(50.0) / (z * 50.0)   // ≈ 2.7
    assert(wBig < 1.0 && wSmall > 2.0)
    // deterministic totals land within ±3·sqrt(n) of the expectation
    assert(math.abs(out("big") - 800 * wBig) < 3 * math.sqrt(800),
      s"big: ${out("big")} vs ${800 * wBig}")
    assert(math.abs(out("small") - 50 * wSmall) < 3 * math.sqrt(50),
      s"small: ${out("small")} vs ${50 * wSmall}")
    // corpus size preserved in expectation
    assert(math.abs(out.values.sum - 850.0) < 3 * math.sqrt(850))
    // rerun-deterministic
    val again = Sampling.temperatureMixture(df, col("lang"), col("doc_id"), 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
    // alpha = 1 is the identity mixture: exactly one copy per doc
    val id = Sampling.temperatureMixture(df, col("lang"), col("doc_id"), 1.0)
    assert(id.count() == 850 &&
      id.agg(max("copy_idx")).collect().head.getLong(0) == 1L)
  }

  test("nearDupDecontaminate: near-variants of benchmark docs dropped, distinct ones kept") {
    def words(seed: Int, n: Int) = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(n)("w" + rnd.nextInt(50)).mkString(" ")
    }
    val benchText = words(1, 60)
    val nearText = benchText.split(" ").updated(0, "zzz").mkString(" ") // ~1-shingle edit
    val corpus = Seq(
      (1L, benchText),       // exact benchmark copy → dropped
      (2L, nearText),        // near-dup of benchmark → dropped
      (3L, words(2, 60)),    // unrelated → kept
      (4L, words(3, 60))).toDF("doc_id", "text")
    val bench = Seq((9L, benchText)).toDF("doc_id", "text")
    val kept = Sampling.nearDupDecontaminate(corpus, bench, threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L), s"kept $kept")
  }

  test("stratifiedSample: per-stratum rates, deterministic, default fallback") {
    val rows = (1L to 2000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "other"))
    val df = rows.toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, col("lang"), col("id"),
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // zh keeps everything, default stratum keeps nothing
    assert(byLang.getOrElse("zh", 0) == rows.count(_._2 == "zh"))
    assert(!byLang.contains("other"))
    // en keeps ~half (hash-binomial: wide tolerance, zero flake)
    val en = byLang.getOrElse("en", 0)
    assert(en > 200 && en < 466, s"en kept $en of ${rows.count(_._2 == "en")}")
    // determinism: same rows selected under a different partitioning
    val again = Sampling.stratifiedSample(df.repartition(7), col("lang"), col("id"),
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sortBy(_._1).toSeq == kept.sortBy(_._1).toSeq)
    // stratified with fraction f is exactly hashSample(f) within the stratum
    val enOnly = Sampling.hashSample(df.filter(col("lang") === "en"), col("id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept.filter(_._2 == "en").map(_._1).toSet == enOnly)
  }

  test("weightedTopKSample: exact k, no repeats, deterministic, weight bias") {
    import spark.implicits._
    // 200 light rows (w=1) + 20 heavy rows (w=1000)
    val df = ((1L to 200L).map(i => (i, 1L)) ++
      (1001L to 1020L).map(i => (i, 1000L))).toDF("id", "w")
    val got = Sampling.weightedTopKSample(df, col("w"), col("id"), k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got.length == 10 && got.distinct.length == 10)
    val again = Sampling.weightedTopKSample(df, col("w"), col("id"), k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == again)
    // heavy rows are 10% of rows but ~99% of mass: they dominate
    assert(got.count(_ > 1000L) >= 8, s"heavy rows under-sampled: $got")
    // zero-weight rows can never be drawn
    val z = Sampling.weightedTopKSample(
      (df.collect().map(r => (r.getLong(0), 0L)).toSeq).toDF("id", "w"),
      col("w"), col("id"), k = 5)
    assert(z.isEmpty)
  }

  test("systematicSample: every k-th of the ordered frame, offset honored") {
    val rows = (1L to 100L).map(i => (i, i * 7 % 101)).toDF("id", "v")
    val got = Sampling.systematicSample(rows, col("v"), col("id"),
        k = 10, offset = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 10, s"$got")
    // recompute the frame ranks independently
    val frame = rows.collect().map(r => (r.getLong(1), r.getLong(0)))
      .sorted.map(_._2)
    val exp = frame.zipWithIndex.filter(_._2 % 10 == 3).map(_._1).toSet
    assert(got == exp, s"$got vs $exp")
    // k=1 keeps everything
    assert(Sampling.systematicSample(rows, col("v"), col("id"), 1)
      .count() == 100)
  }

  test("purgedTemporalSplit: exact band edges and the no-leakage gap") {
    val rows = (0L to 100L).map(ts => (ts, ts)).toDF("id", "ts")
    val split = Sampling.purgedTemporalSplit(rows, col("ts"), 1, 5, 10L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // range [0,100], cutoff = 0 + (100*4) div 5 = 80
    assert(split.size == 101, "a row was lost or duplicated")
    assert((0L to 80L).forall(split(_) == "train"))
    assert((81L to 90L).forall(split(_) == "embargo"))
    assert((91L to 100L).forall(split(_) == "val"))
    // the property the embargo exists for: min(val) - max(train) > embargo
    assert(91L - 80L > 10L)
    // valNum = 0 puts the cutoff at max ts: everything trains
    val all = Sampling.purgedTemporalSplit(rows, col("ts"), 0, 5, 10L)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(all == Set("train"))
    // partitioning-invariant (no hash, no order dependence)
    val re = Sampling.purgedTemporalSplit(rows.repartition(7), col("ts"),
        1, 5, 10L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(re == split)
  }

  test("purgedTemporalSplit: undated rows get a NULL split, not 'val'") {
    // a NULL ts must not fall through when/when/otherwise into the
    // validation fold — that's the leak-adjacent fold the purge
    // exists to protect
    val rows = ((0L to 100L).map(ts => (ts, Some(ts))) :+
      (999L, Option.empty[Long])).toDF("id", "ts")
    val split = Sampling.purgedTemporalSplit(rows, col("ts"), 1, 5, 10L)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(split(999L).isEmpty, s"NULL ts landed in ${split(999L)}")
    // dated rows are untouched by the NULL row's presence (the
    // min/max bounds ignore NULLs)
    assert(split(0L).contains("train") && split(100L).contains("val"))
    assert(split.size == 102)
  }

  test("incrementalDecontaminate: hand case — only newly-hit survivors leave") {
    val words = (1 to 13).map(i => s"w$i").mkString(" ")
    val other = (1 to 13).map(i => s"x$i").mkString(" ")
    val clean = (1 to 13).map(i => s"z$i").mkString(" ")
    // doc 1 was dropped by the OLD bench (not in survivors); doc 2 is
    // hit only by the NEW bench; doc 3 stays clean
    val corpus = Seq((1L, words), (2L, other), (3L, clean))
      .toDF("doc_id", "text")
    val survivors = Seq(2L, 3L).toDF("doc_id")
    val newBench = Seq((100L, other)).toDF("doc_id", "text")
    val out = graft.operators.Sampling.incrementalDecontaminate(
        survivors, graft.operators.Sampling.ngramIndex(corpus), newBench)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(3L), s"$out")
  }

  test("incrementalDecontaminate equals the full rebuild on real docs (end-to-end)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldBench = docs.filter(col("doc_id") % 20 === 0)
    val newBench = docs.filter(col("doc_id") % 20 === 10)
    val standing = graft.operators.Sampling
      .ngramDecontaminate(docs, oldBench).select("doc_id")
    val incr = graft.operators.Sampling.incrementalDecontaminate(
        standing, graft.operators.Sampling.ngramIndex(docs), newBench)
      .collect().map(_.getLong(0)).toSet
    val full = graft.operators.Sampling
      .ngramDecontaminate(docs, docs.filter(col("doc_id") % 10 === 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incr == full, "incremental survivors diverged from full rebuild")
  }

  test("neymanAllocation: budget splits by N*sigma; remainders prorate exactly") {
    import spark.implicits._
    // A: sigma 5 n 4; B: constant (weight 0); C: sigma 10 n 2 ->
    // weights 2e7/0/2e7
    val df = Seq(("A", 0L), ("A", 0L), ("A", 10L), ("A", 10L),
      ("B", 5L), ("B", 5L), ("B", 5L), ("B", 5L),
      ("C", 0L), ("C", 20L)).toDF("g", "v")
    val ten = Sampling.neymanAllocation(df, "g", col("v"), budget = 10L,
        scale = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(ten("A") == ((5.0, 0.5, 5L)), s"$ten")
    assert(ten("B") == ((0.0, 0.0, 0L)), s"$ten")
    assert(ten("C") == ((10.0, 0.5, 5L)), s"$ten")
    // budget 5: A/C floor to 2 each, the spill unit goes to the
    // remainder tie's lowest stratum name
    val five = Sampling.neymanAllocation(df, "g", col("v"), budget = 5L,
        scale = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(five == Map("A" -> 3L, "B" -> 0L, "C" -> 2L), s"$five")
    assert(five.values.sum == 5L)
  }

  test("equalMassEce: exact rank bins; hand-computed terms") {
    import spark.implicits._
    // scores .1/.2/.3/.4, labels F/F/T/T, 2 bins ->
    // bin0 mean .15 pos 0 (term .15*.5), bin1 mean .35 pos 2
    // (term |.35-1|*.5)
    val df = Seq((1L, 0.1, false), (2L, 0.2, false), (3L, 0.3, true),
      (4L, 0.4, true)).toDF("id", "s", "y")
    val out = Sampling.equalMassEce(df, "s", "y", col("id"), bins = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(0L) == ((2L, 0L, 0.15, 0.0, 0.075)), s"$out")
    assert(out(1L) == ((2L, 2L, 0.35, 1.0, 0.325)), s"$out")
  }

  test("contaminationSpans: hit positions and fraction; clean docs absent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Seq((1L, "a b c d e"), (2L, "p q r s t"),
      (3L, "x y x y x")).toDF("doc_id", "text")
    val bench = Seq((10L, "b c d"), (11L, "x y x")).toDF("doc_id", "text")
    val out = Sampling.contaminationSpans(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // doc 1: gram "b c d" at position 2 of 3
    assert(out(1L) == ((3L, 1L, 2L, 2L, 0.333333)), s"$out")
    // doc 3: "x y x" repeats at positions 1 AND 3
    assert(out(3L) == ((3L, 2L, 1L, 3L, 0.666667)), s"$out")
    // doc 2 shares nothing: no row
    assert(!out.contains(2L), s"$out")
  }

  test("rendezvousShard: movers land ONLY on the new shard; ~1/nNew move") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (1L to 400L).toDF("id")
    val out = Sampling.rendezvousShard(ids, col("id"), nOld = 8, nNew = 9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // the defining HRW property: no mover lands on a surviving shard
    assert((0L to 7L).forall(s => out(s)._2 == 0L), s"$out")
    // the new shard is built ENTIRELY of movers
    assert(out(8L)._1 == out(8L)._2 && out(8L)._1 > 0, s"$out")
    // movement is ~1/9 of rows (generous band)
    val moved = out(8L)._2.toDouble / 400.0
    assert(moved > 0.03 && moved < 0.25, s"moved frac $moved")
    assert(out.values.map(_._1).sum == 400L)
  }
}
