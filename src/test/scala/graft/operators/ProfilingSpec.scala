package graft.operators

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewProfile: hand-computed shares/ratios/salts, tie break at the cut") {
    // a×6, b×2, c×2, d×2 → total 12, 4 keys, mean 3
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(2)("d")).toDF("k")
    val r = Profiling.keySkewProfile(df, Seq("k"), topN = 3).collect()
    // b/c/d all tie at 2 — the cut keeps the lexicographically first two
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(r(0).getLong(1) == 6 && r(0).getDouble(2) == 0.5)
    assert(r(0).getDouble(3) == 2.0 && r(0).getLong(4) == 2)
    val third = BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1).getDouble(3) == third && r(1).getLong(4) == 1,
      s"2-count key: ratio 2/3, salt ceil = 1: ${r(1)}")
  }

  test("keySkewProfile plans a TakeOrderedAndProject, not a global sort") {
    val df = (1 to 100).map(i => s"k${i % 7}").toDF("k")
    val plan = Profiling.keySkewProfile(df, Seq("k"), topN = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"full sort:\n$plan")
  }
}
