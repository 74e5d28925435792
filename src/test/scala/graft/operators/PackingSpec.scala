package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val words = Seq.fill(rnd.nextInt(20))("w" + rnd.nextInt(9)).mkString(" ")
      (i.toLong, if (rnd.nextInt(10) == 0) "" else words) // some empty docs
    }.toDF("doc_id", "text")
  }

  test("packOffsets: contiguous offsets, in-capacity positions, correct spans") {
    val out = Packing.packOffsets(mkDocs(500, 11), seqLen = 64, blockSize = 32L)
      .orderBy("doc_id").collect()
    var expectOff = 0L
    out.foreach { r =>
      val (n, off, seqId, seqPos, endSeq) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(off == expectOff, s"doc ${r.getLong(0)}: offset $off, want $expectOff")
      assert(seqId == off / 64 && seqPos == off % 64 && seqPos < 64)
      assert(endSeq == (off + math.max(n, 1) - 1) / 64)
      expectOff += n
    }
  }

  test("packOffsets: assignment independent of blockSize and partitioning") {
    val docs = mkDocs(400, 23)
    val a = Packing.packOffsets(docs, seqLen = 128, blockSize = 7L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Packing.packOffsets(docs.repartition(13), seqLen = 128, blockSize = 1000L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("packOffsets: three active hierarchy levels (blocks ≫ blockSize) stay exact") {
    // blockSize 2 on 60 docs: 30 blocks → 15 super-blocks, so BOTH
    // partitioned levels and the top window are multi-row — the
    // smallest shape where a missing hierarchy level would corrupt
    // offsets. Compare against the single-block formulation.
    val docs = mkDocs(60, 7)
    val tiny = Packing.packOffsets(docs, seqLen = 32, blockSize = 2L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val flat = Packing.packOffsets(docs, seqLen = 32, blockSize = 1000000L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(tiny == flat)
  }
}
