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
}
