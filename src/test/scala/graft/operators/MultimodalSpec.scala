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

  test("vadSegments: threshold extremes and maximal-run tiling") {
    val docs = (1 to 5)
      .map(i => (i.toLong, ("payload " * (i * 20)).take(i * 150)))
      .toDF("doc_id", "text")
    val bt = Multimodal.asBinaryTable(docs)
    // threshold 0: every frame is active -> exactly one segment per
    // doc spanning all frames (md5-independent pin)
    val all = Multimodal.vadSegments(bt, chunkBytes = 64, threshold = 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(all.keySet == (1L to 5L).toSet)
    (1L to 5L).foreach { i =>
      val nChunks = math.ceil(i * 150 / 64.0).toLong
      assert(all(i) == ((0L, nChunks - 1, nChunks)), s"doc $i: ${all(i)}")
    }
    // threshold 256: nothing is active (energy is one byte)
    assert(Multimodal.vadSegments(bt, chunkBytes = 64, threshold = 256L)
      .isEmpty)
    // mid threshold: segments tile the active frames into MAXIMAL
    // consecutive runs — recompute runs independently from the flat
    // per-frame energies
    val energies = Multimodal.sampleFrames(bt, 64, 1)
      .withColumn("energy",
        conv(substring(md5(hex(col("frame"))), 1, 2), 16, 10).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val active = energies.filter(_._3 >= 128).map(t => (t._1, t._2))
      .groupBy(_._1).map { case (d, fs) =>
        val idx = fs.map(_._2).sorted
        // split into maximal consecutive runs
        val runs = idx.foldLeft(List.empty[List[Long]]) {
          case (acc, f) if acc.nonEmpty && acc.head.head == f - 1 =>
            (f :: acc.head) :: acc.tail
          case (acc, f) => List(f) :: acc
        }.map(r => (r.last, r.head, r.length.toLong)).sortBy(_._1)
        d -> runs
      }
    val segs = Multimodal.vadSegments(bt, chunkBytes = 64, threshold = 128L)
      .collect().groupBy(_.getLong(0)).map { case (d, rows) =>
        d -> rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1).toList
      }
    assert(segs == active.filter(_._2.nonEmpty), s"$segs vs $active")
  }

  test("byteEntropy: constant 0 bits, uniform log2(k) bits, empty dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "aaaa" -> 0 bits; "ab" -> 1 bit; "abcd" -> 2 bits; "" -> no row
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Multimodal.byteEntropy(Multimodal.asBinaryTable(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) == ((4L, 1L, 0.0, false)), s"$out")
    assert(out(2L) == ((2L, 2L, 1.0, false)), s"$out")
    assert(out(3L) == ((4L, 4L, 2.0, false)), s"$out")
    assert(!out.contains(4L), s"$out")
  }
  test("dhashNearDup: a one-byte change still collides on 3 of 4 chunks") {
    val base = "abcdefgh" * 8
    val mod = base.substring(0, 10) + "a" + base.substring(11)
    val docs = Seq((1L, base), (2L, mod), (3L, base),
      (4L, "zyx" * 21 + "q")).toDF("doc_id", "text")
    val out = Multimodal.dhashNearDup(Multimodal.asBinaryTable(docs))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(4)).toMap
    // identical payloads: all 4 chunks; one flipped gradient bit:
    // exactly 3; the unrelated descending pattern never reaches 3
    assert(out((1L, 3L)) == 4L, s"$out")
    assert(out((1L, 2L)) == 3L && out((2L, 3L)) == 3L, s"$out")
    assert(!out.keys.exists(k => k._1 == 4L || k._2 == 4L), s"$out")
  }

  test("audioConstellation: a shifted copy aligns on one offset; flat payload is silent") {
    // 64-char frames: energy = 64*char; peaks where a frame beats both
    // neighbors. doc 2 = doc 1 shifted right by two low frames.
    def f(c: Char) = c.toString * 64
    val pattern = Seq('a', 'z', 'a', 'm', 'a', 'z', 'a', 'm', 'a', 'z',
      'a', 'm').map(f).mkString
    val docs = Seq(
      (1L, pattern),
      (2L, f('a') + f('a') + pattern),
      (3L, f('q') * 12)).toDF("doc_id", "text")
    val out = Multimodal.audioConstellation(Multimodal.asBinaryTable(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set((1L, 2L)), s"$out")
    val (off, aligned) = out((1L, 2L))
    assert(off == -2L && aligned >= 5L, s"$out")
  }

}
