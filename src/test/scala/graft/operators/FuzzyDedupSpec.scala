package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  // two near-identical docs (one word changed), one unrelated
  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (3L, "completely different content about spark query engines and shuffles here")
  ).toDF("doc_id", "text")

  test("minhashNearDups finds the planted near-dup pair and only it") {
    val pairs = FuzzyDedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("exact jaccard of the planted pair is high, cross pair ~0") {
    val out = FuzzyDedup.exactJaccardPairs(docs, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) > 0.5)
    assert(out.getOrElse((1L, 3L), 0.0) < 0.1)
  }

  test("lsh candidates are a superset of verified pairs (no false negatives here)") {
    val sh = FuzzyDedup.shingled(docs, "doc_id", "text", 3)
    val cand = FuzzyDedup.lshCandidates(sh).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.contains((1L, 2L)))
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val h = FuzzyDedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)))
    assert(h(1L) != h(2L)) // one word did change
  }

  test("shingling: short docs yield empty set, excluded from pipeline") {
    val tiny = Seq((1L, "two words")).toDF("doc_id", "text")
    assert(FuzzyDedup.shingled(tiny, "doc_id", "text", 3).count() == 0)
    assert(FuzzyDedup.minhashNearDups(tiny).count() == 0)
  }

  test("cosineTopK ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.001f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.7f, 0.7f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.cosineTopK(vecs, vecs.filter($"vec_id" === 0), 3)
      .orderBy("rn").collect()
    assert(top.head.getLong(1) == 1L)      // near-parallel vector ranks 1st
    assert(top.head.getDouble(2) > 0.999)
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
  }

  test("ivfTopK never crosses label cells") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 1), // closest overall but other label
      (2L, Array(0.1f, 0.9f), 0)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), 5)
      .collect().map(_.getLong(1))
    assert(top.toSeq == Seq(2L))
  }
}
