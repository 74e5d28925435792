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
}
