package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq((1L, "hello media payload"), (2L, "x" * 3000)).toDF("doc_id", "text")

  test("asBinaryTable: binary payload + typed metadata struct") {
    val bt = Multimodal.asBinaryTable(docs)
    assert(bt.schema("content").dataType.typeName == "binary")
    val meta = bt.select("doc_id", "meta.mime", "meta.n_bytes").orderBy("doc_id")
      .collect()
    assert(meta(0).getString(1) == "image/png")
    assert(meta(0).getLong(2) == "hello media payload".length)
    assert(meta(1).getLong(2) == 3000L)
  }

  test("extractMeta (expression path) and decodeBatch (codec path) agree") {
    val bt = Multimodal.asBinaryTable(docs)
    val exprMeta = Multimodal.extractMeta(bt).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    val codecMeta = Multimodal.decodeBatch(bt).orderBy("doc_id").collect()
      .map(m => (m.doc_id, m.width, m.height, m.channels))
    assert(exprMeta.toSeq == codecMeta.toSeq)
    // fake dims bounded as documented
    exprMeta.foreach { case (_, w, h, c) =>
      assert(w >= 16 && w <= 1024 && h >= 16 && h <= 1024 && c >= 1 && c <= 4)
    }
  }

  test("sampleFrames: every stride-th chunk, correct sizes") {
    val bt = Multimodal.asBinaryTable(docs.filter($"doc_id" === 2))
    val frames = Multimodal.sampleFrames(bt, chunkBytes = 1000, stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(frames(0).getAs[Array[Byte]]("frame").length == 1000)
    assert(frames(1).getAs[Array[Byte]]("frame").length == 1000)
  }
}
