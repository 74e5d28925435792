package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  val big = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "id")
  val small = Seq((5L, "x"), (40L, "y"), (96L, "z"), (200L, "w"))
    .toDF("k", "attr")

  test("bloomJoin equals the plain inner join exactly") {
    val got = BloomJoin.bloomJoin(big, small, "k")
      .select("k", "id", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = big.join(small, Seq("k"))
      .select("k", "id", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("bloomJoin: null big-side keys dropped, like an inner join") {
    val bigN = Seq((Option(5L), 1L), (Option.empty[Long], 2L))
      .toDF("k", "id")
    val got = BloomJoin.bloomJoin(bigN, small, "k").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("bloom pre-filter is selective before the join") {
    // the filtered big side (pre-join) must be far smaller than big:
    // 4 true keys of 97 ≈ 4% pass rate + bloom false positives
    val sketch = Sketches.bloomBuild(
      small.select(col("k").cast("string").as("k")), "k")
    assert(sketch.count() <= 256)
    val prefiltered = BloomJoin.bloomJoin(big, small.limit(4), "k")
    // effectiveness shows up in the final count: ≤ big/10
    assert(prefiltered.count() < 100)
  }
}
