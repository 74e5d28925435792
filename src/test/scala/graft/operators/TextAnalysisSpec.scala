package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  def docs = Seq(
    (1L, "The quick brown fox, and the lazy dog!"),
    (2L, "Der Hund und die Katze sind mit von der Partie."),
    (3L, "你好 世界"),
    (4L, ""),
    (5L, "  Mixed   CASE\ttext  ")
  ).toDF("doc_id", "text")

  test("tokenStats: counts, distincts, alnum mass") {
    val r = TextAnalysis.tokenStats(docs).orderBy("doc_id").collect()
    // doc 1: the quick brown fox and the lazy dog → 8 tokens, 7 uniq
    assert(r(0).getLong(1) == 8 && r(0).getLong(2) == 7)
    assert(r(0).getLong(3) == "thequickbrownfoxandthelazydog".length)
    // empty doc → all zeros
    assert(r(3).getLong(1) == 0 && r(3).getLong(3) == 0)
  }

  test("bm25 matches the hand formula; rare term outranks common; misses absent") {
    // 'cat' in 1 of 4 docs (rare), 'dog' in 3 of 4 (common), doc 4 has neither
    val corpus = Seq(
      (1L, "cat dog dog"),
      (2L, "dog bird"),
      (3L, "dog fish fish fish"),
      (4L, "bird fish")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(corpus, Seq("cat", "dog"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L), "doc 4 has no query term")
    def idf(df: Double) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, avgdl: Double, dfx: Double) =
      idf(dfx) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val avgdl = (3 + 2 + 4 + 2) / 4.0
    val want1 = BigDecimal(w(1, 3, avgdl, 1) + w(2, 3, avgdl, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = got.map(t => t._1 -> t._2).toMap // id -> score
    assert(math.abs(got.find(_._1 == 1L).get._2 - want1) < 1e-9,
      s"doc 1 score ${got.toSeq}, want $want1")
    // the rare-term doc outranks every dog-only doc
    assert(got.head._1 == 1L && got.head._3 == 2L)
    assert(s(1L) > s(2L) && s(1L) > s(3L))
  }

  test("crossDocGramStats: shared span mass, short docs survive as zero") {
    // docs 1 and 2 share the span "a b c" (one 3-gram); doc 3 is
    // disjoint; doc 4 is too short for any 3-gram
    val corpus = Seq(
      (1L, "a b c x y"),   // grams: abc bcx cxy
      (2L, "q a b c"),     // grams: qab abc
      (3L, "m n o p"),     // grams: mno nop
      (4L, "t u")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.crossDocGramStats(corpus, n = 3)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r(0) == ((1L, 3L, 1L, BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(r(1) == ((2L, 2L, 1L, 0.5)))
    assert(r(2) == ((3L, 2L, 0L, 0.0)))
    assert(r(3) == ((4L, 0L, 0L, 0.0)))
  }

  test("vocabCoverage: hand-computed cumulative mass, deterministic tie order") {
    // counts: b=3, a=2, c=1 → total 6; ties impossible here, but a/c
    // order under equal counts is pinned by the term tiebreak
    val corpus = Seq((1L, "b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(corpus, topK = 2)
      .orderBy("rank").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      ("b", 3L, 1L, 0.5),
      ("a", 2L, 2L, BigDecimal(5.0 / 6).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("crossDocGramStats counts repeated positions with multiplicity") {
    // "a b c a b c a b c": grams at 7 positions, every gram ALSO in doc 2
    val corpus = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.crossDocGramStats(corpus, n = 3)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 7)
    // only the 3 "a b c" positions are CROSS-doc shared
    assert(r(0).getLong(2) == 3)
    assert(r(1).getLong(1) == 1 && r(1).getLong(2) == 1)
  }

  test("quality: empty doc yields null ratios, low score") {
    val r = TextAnalysis.qualityScore(docs).filter($"doc_id" === 4).collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(5) < 0.5)
  }

  test("langId: stopword majority and CJK detection") {
    val r = TextAnalysis.languageId(docs).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "en")
    assert(r(2L) == "de")
    assert(r(3L) == "zh")
  }

  test("fingerprint invariant to case/whitespace, sensitive to content") {
    val fp = TextAnalysis.fingerprints(
      Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "hello worlds"))
        .toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(fp(0) == fp(1) && fp(1) != fp(2))
  }

  test("fingerprint64 fits positive signed long (60-bit)") {
    val v = TextAnalysis.fingerprints(docs.filter($"doc_id" === 1))
      .select("fp64").collect().head.getLong(0)
    assert(v > 0L)
  }

  test("chunkDocuments: overlapping windows cover every token, final chunk short") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ") // 25 tokens
    val chunks = TextAnalysis.chunkDocuments(
        Seq((1L, text)).toDF("doc_id", "text"), chunkTokens = 10, overlap = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    // stride 6: starts 1, 7, 13, 19, 25 → 5 chunks
    assert(chunks.length == 5)
    assert(chunks.head._3.startsWith("w1 w2") && chunks.head._2 == 10)
    // consecutive chunks overlap by 4 tokens
    assert(chunks(1)._3.startsWith("w7 w8"))
    assert(chunks.last._2 == 1 && chunks.last._3 == "w25")
    // every token appears in some chunk
    val covered = chunks.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 25).map(i => s"w$i").toSet)
  }

  test("chunkDocuments: empty doc emits one empty chunk") {
    val chunks = TextAnalysis.chunkDocuments(
      Seq((1L, "")).toDF("doc_id", "text")).collect()
    assert(chunks.length == 1 && chunks.head.getLong(2) == 0L)
  }

  test("redactPii replaces emails, phones, and digit runs with typed placeholders") {
    val out = TextAnalysis.redactPii(Seq(
        // 6–7 digit runs hit the NUM tier; ≥8 bare digits are
        // phone-shaped and intentionally caught by the PHONE tier
        (1L, "contact bob.smith+x@example.com or call +1 (555) 123-4567 ref 654321"),
        (2L, "nothing sensitive here")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getString(1) == "contact <EMAIL> or call <PHONE> ref <NUM>",
      s"got: ${r1.getString(1)}")
    assert(r1.getLong(2) == 1L && r1.getLong(3) == 1L)
    assert(out(1).getString(1) == "nothing sensitive here")
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L)
  }

  test("tokenEntropy: hand-computed distributions; degenerate text scores 0") {
    val out = TextAnalysis.tokenEntropy(Seq(
        (1L, "a a b b"),       // uniform over 2 → ln 2
        (2L, "a a a a"),       // single token → 0 bits
        (3L, "a b c d")        // uniform over 4 → ln 4
      ).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(1) == r6(math.log(2)) && out(0).getLong(2) == 4)
    assert(out(1).getDouble(1) == 0.0)
    assert(out(2).getDouble(1) == r6(math.log(4)))
  }

  test("unigramLogProb: hand-computed corpus distribution; empty docs absent") {
    val out = TextAnalysis.unigramLogProb(Seq(
        (1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    // vocab: a→2, b→2, c→1, total 5
    assert(out.length == 2) // the empty doc has nothing to score
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getDouble(1) == BigDecimal(math.log(0.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(0).getLong(2) == 3L)
    val want2 = (math.log(0.4) + math.log(0.2)) / 2
    assert(math.abs(out(1).getDouble(1) - want2) < 1e-6)
    // corpus-typical text outscores vocabulary-anomalous text
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("cleanupGate (fused, 1 scan) selects exactly what the composed operators select") {
    import org.apache.spark.sql.functions.{col, min}
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = TextAnalysis.cleanupGate(corpus)
      .collect().map(_.getLong(0)).toSet
    // the composed form: each operator separately, joined
    val q = TextAnalysis.qualityScore(corpus).select("doc_id", "quality")
    val l = TextAnalysis.languageId(corpus)
    val r = TextAnalysis.repetitionSignals(corpus).select("doc_id", "dup_token_frac")
    val surv = corpus.select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint64(col("text")).as("_fp"))
      .groupBy("_fp").agg(min("doc_id").as("survivor"))
    val composed = corpus.select("doc_id")
      .join(q, "doc_id").join(l, "doc_id").join(r, "doc_id")
      .join(surv, col("doc_id") === col("survivor"), "left_semi")
      .filter(col("predicted_lang") === "en" && col("quality") >= 0.45 &&
        col("dup_token_frac") <= 0.65)
      .collect().map(_.getLong(0)).toSet
    assert(fused == composed, s"fused-only=${(fused -- composed).take(5)} " +
      s"composed-only=${(composed -- fused).take(5)}")
    assert(fused.nonEmpty)
    // and the fused plan reads the corpus exactly once
    val scans = TextAnalysis.cleanupGate(corpus).queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if r.nodeName == "Relation" => r
    }
    assert(scans.size <= 1, s"fused gate scans the corpus ${scans.size} times")
  }

  test("repetitionSignals: hand-computed gram fractions and tie-breaks") {
    val out = TextAnalysis.repetitionSignals(Seq(
        (1L, "a b a b a"), // bigrams: "a b"×2, "b a"×2 (tie → "a b")
        (2L, "hello"),     // single token: no grams
        (3L, ""),          // empty: everything zero
        (4L, "x y z")      // all unique: zero repetition
      ).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getLong(1) == 5) // n_tokens
    assert(d1.getDouble(2) == 0.6) // (5-2)/5 duplicate tokens
    assert(d1.getString(3) == "a b") // tie broken to min bigram
    // top bigram covers 2×(1+1)=4 of 5 alnum chars
    assert(d1.getDouble(4) == 0.8)
    // trigrams: "a b a"×2 (3 chars each) + "b a b"×1 → 6/9
    assert(d1.getDouble(5) == 0.666667)
    val d2 = out(1)
    assert(d2.getLong(1) == 1 && d2.getString(3) == "" &&
      d2.getDouble(2) == 0.0 && d2.getDouble(4) == 0.0 && d2.getDouble(5) == 0.0)
    val d3 = out(2)
    assert(d3.getLong(1) == 0 && d3.getDouble(2) == 0.0 && d3.getString(3) == "")
    val d4 = out(3)
    assert(d4.getDouble(2) == 0.0 && d4.getDouble(5) == 0.0)
    // all-unique doc still reports its (unrepeated) top bigram
    assert(d4.getString(3) == "x y")
  }

  test("bigramLogProb: hand-computed smoothed scores; short docs absent") {
    // corpus bigrams: c12(a,b)=3, (b,a)=1, (b,c)=1; c1(a)=3, c1(b)=2;
    // V = 4 ({a,b,c,solo} — the bigram-less doc still feeds the vocab)
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    // doc1: avg(ln(3.5/5), ln(1.5/4), ln(3.5/5)) = -0.564726
    // doc2: avg(ln(3.5/5), ln(1.5/4)) = -0.668752
    assert(out == Map(1L -> ((3L, -0.564726)), 2L -> ((2L, -0.668752))))
    assert(!out.contains(3L)) // single-token doc has no bigram
  }

  test("invertedIndex: df/cf, rank-ordered capped postings") {
    val docs = Seq((1L, "x x x y"), (2L, "x y y"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, topPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // x: df 3, cf 5, top-2 postings by tf desc then doc asc
    assert(out == Map(
      "x" -> ((3L, 5L, "1:3,2:1")),
      "y" -> ((2L, 3L, "2:2,1:1"))))
  }

  test("dropDuplicateSpans removes cross-doc spans, keeps order, drops empty docs") {
    // span size 2: doc1 = [a b][c d][e f], doc2 = [a b][x y], doc3 = [c d],
    // doc4 = "" (vanishes), doc5 = [a b] (all spans dup → vanishes)
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b x y"), (3L, "c d"),
      (4L, ""), (5L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.dropDuplicateSpans(docs, spanTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // [a b] in docs 1,2,5; [c d] in docs 1,3 → both dropped everywhere
    assert(out == Map(1L -> (("e f", 1L)), 2L -> (("x y", 1L))))
  }

  test("dropDuplicateSpans: a within-doc repeat alone does not trigger a drop") {
    val docs = Seq((1L, "a b a b"), (2L, "q r")).toDF("doc_id", "text")
    val out = TextAnalysis.dropDuplicateSpans(docs, spanTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "a b" occurs twice but only in ONE distinct doc → kept intact
    assert(out == Map(1L -> "a b a b", 2L -> "q r"))
  }

  test("llrKeyness: closed-form G2 and direction on a tiny corpus pair") {
    // A: "cat cat dog" (NA=3), B: "dog dog dog fish" (NB=4)
    val docs = Seq(("a", "cat cat dog"), ("b", "dog dog dog fish"))
      .toDF("side", "text")
    val out = TextAnalysis.llrKeyness(docs, "text", col("side") === "a", 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // cat: a=2, b=0, Ea = 3*2/7 -> G2 = 2 * 2 ln(7/3), key in A
    assert(out("cat")._1 == 2L && out("cat")._2 == 0L)
    assert(out("cat")._3 == math.rint(4 * math.log(7.0 / 3) * 1e6) / 1e6)
    // fish: only in B -> negative keyness
    assert(out("fish")._3 == -(math.rint(2 * math.log(7.0 / 4) * 1e6) / 1e6))
    // dog: a=1 vs NA=3, b=3 vs NB=4 -> under-represented in A
    assert(out("dog")._3 < 0)
  }

  test("llrKeyness: balanced token scores zero; minCount filters") {
    // a=1/NA=2, b=2/NB=4: proportions equal -> G2 = 0 exactly
    val docs = Seq(("a", "even x"), ("b", "even even y z"))
      .toDF("side", "text")
    val out = TextAnalysis.llrKeyness(docs, "text", col("side") === "a", 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("even") == 0.0)
    assert(TextAnalysis.llrKeyness(docs, "text", col("side") === "a", 3L)
      .collect().map(_.getString(0)).toSet == Set("even"))
  }

  // ── featureHash / ngramNovelty / tagKeywords (round 7) ────────────

  test("featureHash: deterministic, bounded buckets, repeats accumulate") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta alpha"), (2L, "alpha")).toDF("doc_id", "text")
    val rows = TextAnalysis.featureHash(d, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keys.forall { case (_, b) => b >= 0 && b < 16 })
    // doc 1 has alpha twice: its alpha-bucket weight is 2x doc 2's
    val alphaB = rows.collect { case ((2L, b), w) => (b, w) }.toSeq
    assert(alphaB.size == 1)
    val (ab, aw) = alphaB.head
    assert(math.abs(rows((1L, ab))) >= math.abs(aw) &&
      rows((1L, ab)) % aw == 0)
    // partitioning invariance
    val x = TextAnalysis.featureHash(d.repartition(5), dim = 16)
      .collect().map(_.toString).sorted.toSeq
    assert(x == TextAnalysis.featureHash(d, dim = 16)
      .collect().map(_.toString).sorted.toSeq)
  }

  test("ngramNovelty: unique text scores 1, cloned text scores 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),          // clone of 1
      (3L, "seven eight nine ten eleven twelve"))   // unique
      .toDF("doc_id", "text")
    val m = TextAnalysis.ngramNovelty(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) == 0.0 && m(2L) == 0.0, "cloned grams have df=2")
    assert(m(3L) == 1.0, "unique doc is fully novel")
  }

  test("tagKeywords: sorted tags, empty when nothing matches") {
    import spark.implicits._
    val d = Seq(
      (1L, "the window and the table"),
      (2L, "nothing relevant here")).toDF("doc_id", "text")
    val m = TextAnalysis.tagKeywords(d, Seq("table", "window", "hash"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(m(1L) == (("table,window", 2)))
    assert(m(2L) == (("", 0)))
  }

  // ── powerLawAlpha / termBurstiness (round 7) ──────────────────────

  test("powerLawAlpha: recovers a planted exponent; xmin-only group is null") {
    import spark.implicits._
    // x = xmin * exp((i-0.5)/n * ln(xmax/xmin))-ish inverse-CDF draw
    // for alpha=2.5: F^-1(u) = xmin * (1-u)^(-1/(alpha-1))
    val n = 5000
    val draws = (1 to n).map { i =>
      val u = (i - 0.5) / n
      ("a", (100.0 * math.pow(1 - u, -1.0 / 1.5)).toLong)
    }
    val flat = (1 to 50).map(_ => ("b", 100L))
    val out = TextAnalysis.powerLawAlpha(
      (draws ++ flat).toDF("g", "x"), "g", "x", xmin = 100L)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(out("a").get - 2.5) < 0.1, s"alpha drifted: ${out("a")}")
    assert(out("b").isEmpty, "all-at-xmin group must be null, not Infinity")
  }

  test("termBurstiness: bursty term outscores an evenly spread one") {
    import spark.implicits._
    // 'even' once in every doc (VMR < 1 impossible... = (1-mean) for
    // all-ones: VMR = 1 - 1 = 0-ish); 'burst' 10x in one doc only
    val d = (1L to 10L).map { i =>
      (i, if (i == 1L) "even " + ("burst " * 10) else "even pad")
    }.toDF("doc_id", "text")
    val m = TextAnalysis.termBurstiness(d, topN = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(m("burst") > 5.0, s"planted burst not detected: $m")
    assert(m("even") == 0.0, s"uniform term must have zero dispersion: $m")
  }

  test("bpePairStats: positions weighted by term freq; 1-char terms dropped") {
    import spark.implicits._
    // "aaa" freq 2 contributes pair "aa" at 2 positions x weight 2;
    // "bb" freq 1 one position; "a" has no pair
    val d = Seq((1L, "aaa bb a"), (2L, "aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq("aa" -> ((4L, 2L)), "bb" -> ((1L, 1L))),
      s"pairs: ${out.toSeq}")
  }

  test("piiDensity: email+phone counted, density gate, clean doc zero") {
    import spark.implicits._
    val d = Seq((1L, "mail a@b.com now call 5551234567 ok"),
      (2L, "perfectly clean prose with no contacts"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.piiDensity(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L && out(1L)._4,
      s"one email + one phone, dense enough to flag: $out")
    assert(out(2L) == ((0L, 0L, 0.0, false)), s"clean: $out")
    assert(out(3L) == ((0L, 0L, 0.0, false)), s"empty text scores 0: $out")
  }

  test("langMismatch: per-source label-noise rate from detected language") {
    import spark.implicits._
    val d = Seq(
      (1L, "s1", "en", "the cat and the dog is in it"),
      (2L, "s1", "en", "it is a fine day for the park"),
      (3L, "s1", "en", "der hund und die katze ist mit von"),  // lies
      (4L, "s2", "zh", "中文文本")).toDF(
      "doc_id", "source", "lang", "text")
    val out = TextAnalysis.langMismatch(d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("s1") == ((3L, 1L, 0.333333)), s"one liar in three: $out")
    assert(out("s2") == ((1L, 0L, 0.0)), s"honest source: $out")
  }

  test("zipfSlope: planted f = 720/r corpus recovers slope -1") {
    import spark.implicits._
    // freqs 720,360,240,180,144,120 = 720/r exactly: ln f is linear
    // in ln r with slope -1 and intercept ln 720
    val text = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"w$r"))
      .mkString(" ")
    val out = TextAnalysis.zipfSlope(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(out.getLong(0) == 6L)
    assert(math.abs(out.getDouble(1) + 1.0) < 1e-4, s"slope: $out")
    assert(math.abs(out.getDouble(2) - math.log(720.0)) < 1e-4,
      s"intercept = ln 720: $out")
  }

  test("collocations: planted pair survives the gate with hand-computed PMI") {
    import spark.implicits._
    // "new york" x5 passes minCount; ten "the xi" bigrams each occur
    // once and are gated out. N1=30 tokens, N2=15 bigrams:
    // PMI = ln((5/15) / ((5/30)*(5/30))) = ln 12 = 2.484907
    val docs = ((1 to 5).map(i => (i.toLong, "new york")) ++
      (1 to 10).map(i => (100L + i, s"the x$i"))).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs).collect()
    assert(out.length == 1, s"only the planted pair passes: ${out.toSeq}")
    val r = out.head
    assert(r.getString(0) == "new york" && r.getLong(1) == 5L &&
      r.getDouble(4) == 2.484907, s"PMI: $r")
  }

  test("lexicalDiversity: ttr and in-doc hapax fraction, degenerate repeat") {
    import spark.implicits._
    val d = Seq((1L, "aa bb aa cc"), (2L, "zz zz zz")).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 3L, 0.75, 0.666667)), s"doc 1: $out")
    assert(out(2L) == ((3L, 1L, 0.333333, 0.0)), s"repeat doc: $out")
  }

  test("goodTuring: hand count-of-counts, missing next bucket NULLs r_star") {
    // bigrams: "a b" x2, "c d" x1 -> N=3, N_1=1, N_2=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.goodTuring(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         r.getDouble(3))).toMap
    // r=1: r* = 2 * N_2/N_1 = 2.0 ; r=2: N_3 = 0 -> NULL
    assert(out(1L) == ((1L, Some(2.0), 0.333333)), s"$out")
    assert(out(2L) == ((1L, None, 0.333333)), s"$out")
    // a one-token doc contributes no bigrams
    val tiny = TextAnalysis.goodTuring(Seq((1L, "solo")).toDF("doc_id", "text"))
    assert(tiny.isEmpty)
  }

  test("readability: hand Flesch, vowel-less token counts one syllable, zero-word NULL") {
    // 6 words, 2 sentences, 6 one-run syllables:
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    val docs = Seq(
      (1L, "The cat sat. It ran fast!"),
      (2L, "7"),        // vowel-less single token: 1 word, 1 syllable
      (3L, "... !!!"),  // no words at all
      (4L, null))       // NULL text: excluded, not emitted
      .toDF("doc_id", "text")
    val rows = TextAnalysis.readability(docs).collect()
    assert(rows.length == 3 && !rows.exists(_.getLong(0) == 4L),
      s"NULL-text doc must be excluded: ${rows.mkString(";")}")
    val out = rows.map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 6L && out(1L).getLong(2) == 2L &&
      out(1L).getLong(3) == 6L, s"${out(1L)}")
    assert(out(1L).getDouble(4) == 119.19, s"${out(1L)}")
    assert(out(2L).getLong(1) == 1L && out(2L).getLong(3) == 1L,
      s"${out(2L)}")
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(4), s"${out(3L)}")
    // multi-run word: "beautiful" = eau|i|u → 3 runs
    val multi = TextAnalysis.readability(
      Seq((1L, "beautiful")).toDF("doc_id", "text")).head
    assert(multi.getLong(3) == 3L, s"$multi")
  }

  test("chao1: hand-computed richness and coverage; f2 = 0 stays defined") {
    // counts a=2 b=2 c=3 d=1: D=4, N=8, f1=1, f2=2
    // chao1 = 4 + 1*0/(2*3) = 4; coverage = 1 - 1/8
    val docs = Seq((1L, "a b b c c c"), (2L, "d a")).toDF("doc_id", "text")
    val out = TextAnalysis.chao1(docs).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3)) == ((4L, 8L, 1L, 2L)), s"$out")
    assert(out.getDouble(4) == 4.0 && out.getDouble(5) == 0.875, s"$out")
    // all singletons, no doubletons: 3 + 3*2/(2*1) = 6, coverage 0
    val single = TextAnalysis.chao1(
      Seq((1L, "x y z")).toDF("doc_id", "text")).head()
    assert(single.getDouble(4) == 6.0 && single.getDouble(5) == 0.0,
      s"$single")
  }

  test("paddingAudit: hand-computed chunks and waste; empty docs excluded") {
    // 3-token and 1-token docs at L=2: chunks 2+1, padded 6, waste 2/6
    val docs = Seq((1L, "a b c"), (2L, "d"), (3L, "... !!!"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.paddingAudit(docs, Seq(2)).head()
    assert((out.getInt(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((2, 2L, 4L, 3L, 6L)), s"$out")
    assert(out.getDouble(5) == 0.333333, s"$out")
    // a length >= every doc: one chunk per doc, waste toward 1
    val big = TextAnalysis.paddingAudit(docs, Seq(10)).head()
    assert(big.getLong(3) == 2L && big.getLong(4) == 20L &&
      big.getDouble(5) == 0.8, s"$big")
  }

  test("stupidBackoff: all three backoff levels and OOV hand-checked") {
    import spark.implicits._
    // fit "a b c a b d": c3(abc)=1, c2(ab)=2, c2(bd)=1, c1(b)=2,
    // c1(d)=1, T=6
    val fit = Seq((2L, "a b c a b d")).toDF("doc_id", "text")
    val apply = Seq(
      (11L, "a b c"),  // trigram hit: 1/2 -> -0.693147
      (13L, "b b d"),  // bigram backoff: 0.4*1/2 -> -1.609438
      (15L, "c a d"),  // unigram backoff: 0.16*1/6 -> -3.624341
      (17L, "a b z")   // z OOV -> null score, n_oov 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(fit, apply)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(11L).getDouble(3) == -0.693147, s"${out(11L)}")
    assert(out(13L).getDouble(3) == -1.609438, s"${out(13L)}")
    assert(out(15L).getDouble(3) == -3.624341, s"${out(15L)}")
    assert(out(17L).getLong(1) == 1L && out(17L).getLong(2) == 1L &&
      out(17L).isNullAt(3), s"${out(17L)}")
  }

  test("heapsLaw: all-unique beta=1, single-token beta=0, empty prefix null") {
    import spark.implicits._
    // every doc contributes 2 never-seen tokens: V(N) = N -> beta 1
    val uniq = (1 to 16).map(i => (i.toLong, s"w${i}a w${i}b"))
      .toDF("doc_id", "text")
    val u = TextAnalysis.heapsLaw(uniq).head()
    assert(u.getLong(0) == 16L && u.getLong(1) == 32L &&
      u.getLong(2) == 32L && u.getDouble(3) == 1.0, s"$u")
    // one token forever: V flat at 1 -> beta 0
    val flat = (1 to 16).map(i => (i.toLong, "z z z")).toDF("doc_id", "text")
    val f = TextAnalysis.heapsLaw(flat).head()
    assert(f.getLong(2) == 1L && f.getDouble(3) == 0.0, s"$f")
    // ids 15..16: the 1/16 prefix is empty -> beta null
    val sparse = Seq((15L, "a b"), (16L, "c d")).toDF("doc_id", "text")
    assert(TextAnalysis.heapsLaw(sparse).head().isNullAt(3))
  }
  test("phraseSearch: consecutive-only matches, overlaps counted, first position") {
    val docs = Seq(
      (1L, "x y the quick fox the quick fox ran"),
      (2L, "quick the fox"),                  // words present, order wrong
      (3L, "the quick brown fox"),            // interrupted -> no match
      (4L, "the quick the quick the quick")).toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(docs, "the quick")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((2L, 2L)), 3L -> ((1L, 0L)), 4L -> ((3L, 0L))),
      s"$out")
  }

  test("rakeKeyphrases: degree/freq word scores, stopword segmentation, top-k order") {
    val docs = Seq(
      (1L, "the quick brown fox of the lazy dog"),
      (2L, "a quick brown fox is quick")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeyphrases(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // quick: freq 3 deg 7 -> 2.333...; brown/fox: deg/freq = 3
    assert(out.toSeq == Seq(
      ("quick brown fox", 2L, 3L, 8.333333),
      ("lazy dog", 1L, 2L, 4.0),
      ("quick", 1L, 1L, 2.333333)), s"${out.toSeq}")
  }

  test("burrowsDelta: style-distinct sources attribute perfectly") {
    // source A: 'the'-heavy; source B: 'of'-heavy; two docs each
    val docs = Seq(
      (1L, "the cat the dog the bird runs", "A"),
      (2L, "the fish the horse the mouse sits", "A"),
      (3L, "house of stone of wood of glass stands", "B"),
      (4L, "ring of gold of silver of iron shines", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.burrowsDelta(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A") == ((2L, 2L, 1.0)), s"$out")
    assert(out("B") == ((2L, 2L, 1.0)), s"$out")
  }

  test("textTiling: vocabulary turnover dips at the topic shift") {
    // blockTokens=4: two vocab-A blocks, then two vocab-B blocks ->
    // interior gap at the A|B seam has sim 0 and positive depth
    val a = "apple banana cherry date apple banana cherry date"
    val b = "xray yankee zulu whiskey xray yankee zulu whiskey"
    val docs = Seq((1L, a + " " + b)).toDF("doc_id", "text")
    val out = TextAnalysis.textTiling(docs, blockTokens = 4,
        minDepth = 0.2)
      .collect().map(r => r.getInt(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // cohesive gaps BESIDE the valley score negative depth (their
    // neighbor is the dip) and never flag; the seam scores +2.0
    assert(out(1) == ((1.0, -1.0, false)), s"$out")
    assert(out(2) == ((0.0, 2.0, true)), s"$out")
    assert(out(3) == ((1.0, -1.0, false)), s"$out")
  }

  test("rrfFuse: hand-computed fusion, one-arm ids kept, integer-exact terms") {
    val a = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("doc_id", "score")
    val b = Seq((20L, 0.95), (40L, 0.5)).toDF("doc_id", "score")
    val out = TextAnalysis.rrfFuse(a, b, kRrf = 60, topK = 10)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getDouble(3), r.getLong(4)))).toMap
    // 20 is rank 2 in A and rank 1 in B -> the only two-arm id wins:
    // (1e12 div 62) + (1e12 div 61) = 32522474880 -> 0.032522 round 6
    assert(out(20L) == ((Some(2L), Some(1L), 0.032522, 1L)), s"$out")
    // 10 (A rank 1) beats 40 (B rank 2) and 30 (A rank 3): exact
    // integer terms decide -- 1e12 div 61 > 1e12 div 62 > 1e12 div 63
    assert(out(10L)._4 == 2L && out(40L)._4 == 3L && out(30L)._4 == 4L,
      s"$out")
    assert(out(40L)._1.isEmpty && out(40L)._2 == Some(2L), s"$out")
    assert(out(10L)._3 == 0.016393, s"$out") // (1e12 div 61) / 1e12
  }

  test("logTemplates: agreeing positions survive, varying ones wildcard") {
    val lines = Seq("get user=1 status=ok", "get user=2 status=ok",
      "get user=3 status=fail", "put item=9", "put item=9")
      .toDF("line")
    val out = TextAnalysis.logTemplates(lines)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // tokens are space-delimited wholes: "user=1" wildcards entirely
    assert(out("get <*> <*>") == ((3L, 3L, 2L)), s"$out")
    assert(out("put item=9") == ((2L, 2L, 0L)), s"$out")
  }

}
