package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  // floor(1e9 / (60 + r)) for r = 1, 2, 3
  private val c1 = 1000000000L / 61
  private val c2 = 1000000000L / 62
  private val c3 = 1000000000L / 63

  test("reciprocalRankFusion: quantized contributions sum per id, ordered fused-desc") {
    val la = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "score")
    val lb = Seq((2L, 9.0), (3L, 8.0), (4L, 7.0)).toDF("id", "score")
    val out = TopK.reciprocalRankFusion(Seq(la, lb), "id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (2L, c2 + c1, 2L), // rank 2 in A + rank 1 in B
      (3L, c3 + c2, 2L),
      (1L, c1, 1L),
      (4L, c3, 1L)))
  }

  test("reciprocalRankFusion: score ties rank by id; topN cutoff is deterministic") {
    // both ids score 5.0 -> rank by id: 1 gets r=1, 2 gets r=2
    val l = Seq((2L, 5.0), (1L, 5.0)).toDF("id", "score")
    val out = TopK.reciprocalRankFusion(Seq(l), "id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, c1), (2L, c2)))
    // topN=1 with equal fused scores keeps the smaller id
    val tied = TopK.reciprocalRankFusion(
      Seq(Seq((7L, 1.0)).toDF("id", "score"),
        Seq((9L, 1.0)).toDF("id", "score")), "id", "score", topN = 1)
      .collect().map(_.getLong(0))
    assert(tied.toSeq == Seq(7L))
  }
}
