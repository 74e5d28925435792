package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions

/** The r14 tokenizer swap (regex → [[TokensOf]] byte scan) changed the
  * innards of the expression EVERY text operator builds on; this spec
  * pins the new kernel to the old regex formulation
  * ([[TextFunctions.tokensRegex]]) — the exact oracle-dual semantics —
  * on adversarial Unicode and on seeded pseudo-random strings. */
class TokensExprSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[String]): Unit = {
    val df = rows.toDF("t")
    val got = df.select(TextFunctions.tokens($"t")).collect().map(_.getSeq[String](0))
    val want = df.select(TextFunctions.tokensRegex($"t")).collect().map(_.getSeq[String](0))
    got.zip(want).zip(rows).foreach { case ((g, w), r) =>
      assert(g == w, s"kernel != regex for input ${r.take(80)}: $g vs $w")
    }
  }

  test("byte-scan kernel equals the regex on adversarial inputs") {
    both(Seq(
      "", " ", "abc", "ABC def", "a1b2c3", "  leading and trailing  ",
      "punct,.;:!?-_=+()[]{}", "tabs\tand\nnewlines\r\n",
      "digits 0123456789 only", "UPPER lower MiXeD",
      "unicode é è ü ß ñ café", "İstanbul DİACRITIC", // İ → i + U+0307
      "Kelvin", // Kelvin sign lowercases to ASCII k
      "emoji 😀😁 between a and b",
      "cjk 中文字符 mixed with ascii",
      "a", "9", "Ω≈ç√∫˜µ", "ＡＢＣ fullwidth", "ß sharp s",
      "x" * 5000, ("word " * 2000).trim))
  }

  test("byte-scan kernel equals the regex on seeded random strings") {
    // alphabet biased toward boundaries: token chars, ASCII seps,
    // multibyte letters (some with ASCII-producing lowercasing)
    val alphabet: IndexedSeq[String] =
      ("abcz019".map(_.toString) ++ " .,\n\t-_/".map(_.toString) ++
        Seq("É", "ü", "İ", "K", "中", "☃", "ß", "😀"))
    val rnd = new scala.util.Random(20260818L)
    val rows = (1 to 300).map { _ =>
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    both(rows)
  }

  test("null text yields null tokens, exactly like the regex path") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("t")
    val got = df.select(TextFunctions.tokens($"t")).collect().map(_.isNullAt(0))
    val want = df.select(TextFunctions.tokensRegex($"t")).collect().map(_.isNullAt(0))
    assert(got.toSeq == want.toSeq && got.head)
  }
}
