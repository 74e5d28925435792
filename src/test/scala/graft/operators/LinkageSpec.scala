package graft.operators

import graft.SparkSpec
import graft.operators.Linkage.FieldComparison
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val comparisons = Seq(
    FieldComparison("email", col("a_em") === col("b_em"), 5.0, -2.0),
    FieldComparison("name", col("a_nm") === col("b_nm"), 3.0, -1.0))

  test("fellegiSunter links only within blocks, scores per F-S weights") {
    val a = Seq(
      (1, 10L, "x@m", "ann"), (1, 11L, "y@m", "bob"), (2, 12L, "z@m", "cat"))
      .toDF("blk", "a_key", "a_em", "a_nm")
    val b = Seq(
      (1, 20L, "x@m", "ann"),  // full match with 10 → 8.0
      (1, 21L, "y@m", "BOB"),  // email-only with 11 → 4.0
      (2, 22L, "q@m", "cat"))  // name-only with 12 → 1.0 (cut)
      .toDF("blk", "b_key", "b_em", "b_nm")
    val out = Linkage.fellegiSunter(a, b, Seq("blk"), "a_key", "b_key",
        comparisons, minScore = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out == Map((10L, 20L) -> 8.0, (11L, 21L) -> 4.0))
  }

  test("cross-block twins never pair: blocking is the only candidate source") {
    val a = Seq((1, 1L, "same@m", "same")).toDF("blk", "a_key", "a_em", "a_nm")
    val b = Seq((2, 2L, "same@m", "same")).toDF("blk", "b_key", "b_em", "b_nm")
    assert(Linkage.fellegiSunter(a, b, Seq("blk"), "a_key", "b_key",
      comparisons, minScore = -100.0).count() == 0)
  }

  test("shared non-blocking column names are rejected loudly") {
    val a = Seq((1, 1L, "x")).toDF("blk", "a_key", "oops")
    val b = Seq((1, 2L, "y")).toDF("blk", "b_key", "oops")
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, b, Seq("blk"), "a_key", "b_key",
        Seq(FieldComparison("o", col("oops") === col("oops"), 1.0, -1.0)), 0.0)
    }
  }

  test("emWeights: scala-replicated 2-iteration EM on a separable mixture") {
    import spark.implicits._
    // 100 all-agree pairs (the matches) + 900 all-disagree pairs
    val pairs = ((1 to 100).map(_ => (true, true)) ++
      (1 to 900).map(_ => (false, false))).toDF("gx", "gy")
    val out = Linkage.emWeights(pairs, Seq("gx", "gy"), iters = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // replicate the exact arithmetic: 2 patterns, F=2, quantized sums
    def q12(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    var (lam, m, u) = (0.1, 0.9, 0.1) // symmetric fields share params
    for (_ <- 1 to 2) {
      def p(g: Boolean) = {
        val pm = (if (g) lam * m * m else lam * (1.0 - m) * (1.0 - m))
        val pu = (if (g) (1.0 - lam) * u * u
                  else (1.0 - lam) * (1.0 - u) * (1.0 - u))
        pm / (pm + pu)
      }
      val (pT, pF) = (p(true), p(false))
      val sp = q12(100L * pT) + q12(900L * pF)
      val su = q12(100L * (1.0 - pT)) + q12(900L * (1.0 - pF))
      val sg = q12(100L * pT); val sug = q12(100L * (1.0 - pT))
      lam = (sp.toDouble / 1e12) / 1000L
      m = sg.toDouble / sp; u = sug.toDouble / su
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = (r6(lam), r6(m), r6(u), r6(math.log(m / u)),
      r6(math.log((1.0 - m) / (1.0 - u))))
    assert(out("gx") == exp && out("gy") == exp, s"$out vs $exp")
    // the mixture separates: matches agree, non-matches don't
    assert(out("gx")._2 > 0.9 && out("gx")._3 < 0.05, s"$out")
    assert(out("gx")._4 > 0 && out("gx")._5 < 0, "weight signs")
  }
}
