package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ivfAssign: each vector lands in multiAssign cells drawn from the seed ids") {
    val assigned = Similarity.ivfAssign(emb, numCells = 8, multiAssign = 2)
    assert(assigned.count() == emb.count() * 2)
    assert(assigned.select("cand_id").distinct().count() == emb.count())
    val cells = assigned.select("cell").distinct().collect().map(_.getLong(0)).toSet
    val seedIds = Similarity.ivfSeeds(emb, 8).select("seed_id").collect()
      .map(_.getLong(0)).toSet
    assert(cells.subsetOf(seedIds))
  }

  test("ivfAssign is deterministic across runs") {
    def run() = Similarity.ivfAssign(emb, numCells = 8)
      .select("cand_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("ivfSearch recall@5 >= 0.9 vs brute-force cosineTopK at defaults") {
    val queries = emb.filter($"vec_id" % 25 === 0) // 20 spread-out queries
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.cosineTopK(emb, queries, 5))
    val ivf = pairs(Similarity.ivfSearch(emb, queries, 5))
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"recall@5 = $recall (defaults: 8 cells, nprobe 4, multiAssign 2)")
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("nearDupPairsUnlabeled: precision 1.0, recall >= 0.9 vs exact all-pairs") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact truth: all-pairs cosine >= 0.4 (no blocking at all)
    val withOneLabel = emb.withColumn("label", lit(0))
    val truth = pairSet(Similarity.nearDupPairs(withOneLabel, 0.4))
    val blocked = pairSet(Similarity.nearDupPairsUnlabeled(emb, 0.4))
    assert(blocked.subsetOf(truth), "blocked search emitted a false pair")
    val recall = (truth intersect blocked).size.toDouble / truth.size
    info(s"recall = $recall over ${truth.size} true pairs")
    assert(recall >= 0.9, s"recall = $recall")
  }

  test("ivfSearch with nprobe = numCells equals brute force exactly") {
    val queries = emb.filter($"vec_id" === 42)
    val brute = Similarity.cosineTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = Similarity.ivfSearch(emb, queries, 5, numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(full == brute)
  }

  test("quantizeInt8: codes in range, reconstruction within half a step") {
    import org.apache.spark.sql.functions._
    val q = Similarity.quantizeInt8(emb).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val (lo, hi, scale) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val codes = r.getSeq[Int](4)
      val xs = r.getSeq[Float](5)
      assert(codes.forall(c => c >= 0 && c <= 255))
      // every element reconstructs within half a quantization step
      xs.zip(codes).foreach { case (x, c) =>
        val xhat = lo + c * scale
        assert(math.abs(x.toDouble - xhat) <= scale / 2 + 1e-9,
          s"x=$x xhat=$xhat scale=$scale")
      }
      assert(hi >= lo && scale >= 0.0)
    }
    // constant vector → scale 0, all-zero codes, exact reconstruction
    val const = Seq((1L, Array.fill(8)(2.5f))).toDF("vec_id", "embedding")
    val cq = Similarity.quantizeInt8(const).collect().head
    assert(cq.getDouble(3) == 0.0 && cq.getSeq[Int](4).forall(_ == 0))
  }
}
