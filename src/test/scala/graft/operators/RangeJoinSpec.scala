package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val L = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 100L))
  private val R = Seq((10L, 10L, 150L), (11L, 10L, 200L), (12L, 10L, 351L),
    (13L, 20L, 100L), (14L, 30L, 100L))

  test("bandJoin equals the naive band predicate, inclusive at the boundary") {
    val got = RangeJoin.bandJoin(
        L.toDF("id", "k", "ts"), R.toDF("rid", "k", "ts"),
        "k", "ts", "ts", 100L)
      .select("id", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (i, lk, lt) <- L; (j, rk, rt) <- R
      if lk == rk && math.abs(lt - rt) <= 100L
    } yield (i, j)).toSet
    assert(got == want)
    assert(got.contains((1L, 11L))) // Δ = exactly width → included
    assert(!got.contains((2L, 12L))) // Δ = width+1 → excluded
    assert(!got.exists { case (i, j) => i == 3L && j == 14L }) // key mismatch
  }

  test("bandJoin random cross-check; plans as an equi-join, not a nested loop") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
    val r = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
    val df = RangeJoin.bandJoin(l.toDF("id", "k", "ts"), r.toDF("rid", "k", "ts"),
      "k", "ts", "ts", 500L)
    val got = df.select("id", "r_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      (i, lk, lt) <- l; (j, rk, rt) <- r
      if lk == rk && math.abs(lt - rt) <= 500L
    } yield (i, j)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // each true pair produced exactly once (bucket fan never duplicates)
    assert(df.count() == want.size)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"band join fell back to a nested loop:\n$plan")
  }
}
