package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the dedup operators (SURVEY.md §5.2):
  * idempotence, subset-of-input, and input-order invariance. Uses
  * scalacheck generators with fixed seeds (the scalatest↔scalacheck
  * bridge artifact isn't in the offline cache). */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  val rowGen: Gen[(String, Option[Long], Int)] = for {
    key <- Gen.oneOf("k1", "k2", "k3", "k4")
    ts <- Gen.option(Gen.choose(0L, 1000L))
    payload <- Gen.choose(0, 100)
  } yield (key, ts, payload)

  def sample(n: Int, seed: Long): List[(String, Option[Long], Int)] =
    Gen.listOfN(30, rowGen).apply(Gen.Parameters.default, Seed(seed)).get

  def dedup(rows: Seq[(String, Option[Long], Int)]) = {
    val df = rows.toDF("id", "ts", "payload")
      .withColumn("ts", to_timestamp(col("ts").cast("double")))
    Dedup.latestPerKey(df, Seq("id"), col("ts"), Seq(col("payload")))
  }

  test("latestPerKey: idempotent, one row per key, subset of input") {
    (1L to 6L).foreach { seed =>
      val rows = sample(30, seed)
      val once = dedup(rows).collect()
        .map(r => (r.getString(0), Option(r.get(1)).map(_.toString), r.getInt(2)))
      assert(once.map(_._1).distinct.length == once.length)
      assert(once.map(_._1).toSet == rows.map(_._1).toSet)
      val input = rows.map(r => (r._1,
        r._2.map(t => new java.sql.Timestamp(t * 1000).toString), r._3)).toSet
      assert(once.forall(r => input.contains((r._1, r._2, r._3))))
    }
  }

  test("latestPerKey: invariant under input shuffling") {
    (10L to 13L).foreach { seed =>
      val rows = sample(25, seed)
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val a = dedup(rows).orderBy("id").collect().toSeq
      val b = dedup(shuffled).orderBy("id").collect().toSeq
      assert(a == b)
    }
  }

  test("jaccard bounds and symmetry on generated shingle sets") {
    val gen = Gen.listOfN(12, Gen.oneOf("a b c", "b c d", "c d e", "x y z"))
    (20L to 22L).foreach { seed =>
      val texts = gen.apply(Gen.Parameters.default, Seed(seed)).get.zipWithIndex
        .map { case (t, i) => (i.toLong, t + " " + t) }
      val df = texts.toDF("doc_id", "text")
      val pairs = FuzzyDedup.exactJaccardPairs(df, threshold = 0.0).collect()
      pairs.foreach { r =>
        val j = r.getDouble(2)
        assert(j >= 0.0 && j <= 1.0)
        assert(r.getLong(0) < r.getLong(1))
      }
    }
  }

  test("rolling fingerprints match the direct Horner fold on generated text") {
    // codepoint alphabet deliberately spans ASCII, 2-byte, 3-byte, and
    // supplementary-plane characters plus whitespace runs
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar.map(_.toString)),
      (2, Gen.oneOf(" ", "  ", "\t", "\n")),
      (2, Gen.oneOf("é", "ü", "中", "文", "😀", "𝔸")))
    val textGen = Gen.listOfN(40, charGen).map(_.mkString)
    def ref(t: String, w: Int, keepMod: Int): Seq[Long] = {
      val cps = t.toLowerCase.replaceAll("\\s+", " ").trim.codePoints().toArray
      (0 to cps.length - w).map { j =>
        cps.slice(j, j + w).foldLeft(0L)((h, c) => (h * 131 + c) % 1000000007L)
      }.filter(_ % keepMod == 0).distinct
    }
    for ((seed, w, keepMod) <- Seq((30L, 2, 1), (31L, 5, 2), (32L, 8, 3))) {
      val texts = Gen.listOfN(25, textGen)
        .apply(Gen.Parameters.default, Seed(seed)).get.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = FuzzyDedup.windowFingerprints(
          texts.toDF("doc_id", "text"), w = w, keepMod = keepMod)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = texts.flatMap { case (i, t) => ref(t, w, keepMod).map((i, _)) }.toSet
      assert(got == want, s"mismatch at seed=$seed w=$w keepMod=$keepMod")
    }
  }
}
