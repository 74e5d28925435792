package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: empty corpora, null text, empty query
  * sets. A library operator must return an empty (correctly-typed)
  * result, never throw — at 100 TB an empty partition-pruned input is
  * routine, not exceptional. */
class EdgeInputSpec extends SparkSpec {
  import spark.implicits._

  val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  val nullDoc = Seq((1L, null: String), (2L, "real text here for contrast")).toDF("doc_id", "text")
  val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")

  test("dedup/text operators on an empty corpus return empty, not errors") {
    assert(FuzzyDedup.minhashNearDups(noDocs).count() == 0)
    assert(FuzzyDedup.exactJaccardPairs(noDocs).count() == 0)
    assert(FuzzyDedup.fingerprintPairs(noDocs).count() == 0)
    assert(FuzzyDedup.simhashPairs(noDocs).count() == 0)
    assert(TextAnalysis.tfIdf(noDocs).count() == 0)
    assert(DedupClusters.resolve(noDocs.select("doc_id"),
      noDocs.select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"))).count() == 0)
  }

  test("null text rows are dropped from hashing pipelines, not propagated") {
    // keepMod = 1 keeps every window: doc 2 must surface, doc 1 (null) must not
    assert(FuzzyDedup.windowFingerprints(nullDoc, keepMod = 1).select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(FuzzyDedup.shingled(nullDoc, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("similarity search with empty corpus or empty queries returns empty") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(Similarity.cosineTopK(emb, emb.filter(lit(false)), 5).count() == 0)
    assert(Similarity.ivfSearch(emb, emb.filter(lit(false)), 5).count() == 0)
    assert(Similarity.nearDupPairsUnlabeled(noVecs, 0.5).count() == 0)
  }

  test("round-4 operators on degenerate inputs return empty/identity, never throw") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // retrieval over empty corpus / corpus with null text
    assert(TextAnalysis.bm25(noDocs, Seq("x")).count() == 0)
    assert(TextAnalysis.bm25(nullDoc, Seq("real")).count() == 1)
    // gram stats: every doc survives, even null/short ones, with zeros
    val g = TextAnalysis.crossDocGramStats(nullDoc, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g.keySet == Set(1L, 2L) && g(1L) == 0L)
    assert(TextAnalysis.crossDocGramStats(noDocs).count() == 0)
    // k-means with corpus smaller than k: clusters = corpus size, total assignment
    val tiny = emb.limit(3)
    val km = Similarity.kmeansRefine(tiny, k = 8, iters = 1).collect()
    assert(km.length == 3)
    // SRP search with empty queries / empty corpus
    assert(Similarity.srpSearch(emb, emb.filter(lit(false)), 5).count() == 0)
    assert(Similarity.srpSearch(noVecs, noVecs, 5).count() == 0)
    // SCD1 with no changes = base unchanged; with no base = inserts only
    val base = Seq((1L, "a")).toDF("k", "n")
    val noCh = Seq.empty[(Long, Long, String, Option[String])].toDF("k", "v", "op", "c")
    assert(Merge.scd1(base, noCh, "k", Seq("v"), col("op") === "del",
      Seq("n" -> "c")).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a")))
    val onlyCh = Seq((2L, 1L, "upd", Option("z"))).toDF("k", "v", "op", "c")
    assert(Merge.scd1(base.filter(lit(false)), onlyCh, "k", Seq("v"),
      col("op") === "del", Seq("n" -> "c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "z")))
    // skew profile: topN beyond key count returns all keys
    assert(Profiling.keySkewProfile(Seq("a", "b").toDF("k"), Seq("k"), topN = 99)
      .count() == 2)
    assert(Profiling.keySkewProfile(noDocs, Seq("doc_id")).count() == 0)
  }

  test("hll on empty input: zero estimate and zero exact, not a NULL row") {
    val r = Sketches.hllDistinct(noDocs.select(col("text").as("v")), "v")
      .collect().head
    assert(r.getDouble(0) == 0.0) // est_distinct via linear counting
    assert(r.getLong(1) == 0L)    // exact_distinct
  }
}
