package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AllocationSpec extends SparkSpec {
  import spark.implicits._

  test("prorate: largest remainder gets the spare pennies; exact conservation") {
    // total 100 over weights 1,1,1: base 33 each, spare 1 -> the
    // lowest tiebreak line gets 34 (all remainders equal)
    val even = Seq((1L, 1L, 100L, 1L), (1L, 1L, 100L, 2L),
      (1L, 1L, 100L, 3L)).toDF("k", "w", "total", "line")
    val got = Allocation.prorate(even, "k", "w", "total", Seq("line"))
      .orderBy("line").collect().map(_.getAs[Long]("alloc")).toSeq
    assert(got == Seq(34L, 33L, 33L))

    // total 10 over weights 2,3,5 divides exactly: 2,3,5
    val exact = Seq((2L, 2L, 10L, 1L), (2L, 3L, 10L, 2L),
      (2L, 5L, 10L, 3L)).toDF("k", "w", "total", "line")
    val ex = Allocation.prorate(exact, "k", "w", "total", Seq("line"))
      .orderBy("line").collect().map(_.getAs[Long]("alloc")).toSeq
    assert(ex == Seq(2L, 3L, 5L))
  }

  test("prorate: spare pennies follow the LARGEST remainders, not order") {
    // total 7, weights 1,2,4 (sum 7? no: 7*1/7=1 exact) — use total
    // 10, weights 1,2,4 (sum 7): shares 10/7, 20/7, 40/7 ->
    // base 1,2,5 rem 3,6,5; spare = 10-8 = 2 -> lines 2 and 3
    val df = Seq((1L, 1L, 10L, 1L), (1L, 2L, 10L, 2L),
      (1L, 4L, 10L, 3L)).toDF("k", "w", "total", "line")
    val got = Allocation.prorate(df, "k", "w", "total", Seq("line"))
      .orderBy("line").collect().map(_.getAs[Long]("alloc")).toSeq
    assert(got == Seq(1L, 3L, 6L))
    assert(got.sum == 10L)
  }

  test("prorate: zero-weight lines allocate zero when shares divide exactly") {
    val df = Seq((1L, 0L, 6L, 1L), (1L, 2L, 6L, 2L), (1L, 1L, 6L, 3L))
      .toDF("k", "w", "total", "line")
    val got = Allocation.prorate(df, "k", "w", "total", Seq("line"))
      .orderBy("line").collect().map(_.getAs[Long]("alloc")).toSeq
    assert(got == Seq(0L, 4L, 2L))
  }

  test("prorate property: conservation and near-proportionality on random data") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 40).flatMap { k =>
      val n = 1 + rng.nextInt(6)
      val total = rng.nextInt(100000).toLong
      (1 to n).map(i => (k.toLong, rng.nextInt(50).toLong + (if (i == 1) 1 else 0), total, i.toLong))
    }
    val df = rows.toDF("k", "w", "total", "line")
    val out = Allocation.prorate(df, "k", "w", "total", Seq("line")).cache()
    // exact conservation per key
    val bad = out.groupBy("k", "total").agg(sum("alloc").as("s"))
      .filter(col("s") =!= col("total")).count()
    assert(bad == 0)
    // every allocation within 1 of the real-valued share
    val off = out
      .withColumn("_sw", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")))
      .filter(abs(col("alloc") - col("total") * col("w") / col("_sw")) > 1)
      .count()
    assert(off == 0)
    out.unpersist()
  }
}
