package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bucket bits little-endian (hand-computed corners)") {
    // bits=2 over declared range [0,4): equal-width bins of width 1,
    // so buckets equal the integer values exactly (power-of-two range
    // -> the binning arithmetic is IEEE-exact)
    val df = Seq((0L, 0L), (3L, 3L), (2L, 1L), (1L, 2L)).toDF("x", "y")
    val z = df.withColumn("z", Layout.zValue(
        Seq($"x", $"y"), Seq(lit(0.0), lit(0.0)), Seq(lit(4.0), lit(4.0)),
        bits = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L)
    assert(z((3L, 3L)) == 15L) // 0b1111
    // x=0b10 -> bits at pos 0,2 = 0,1; y=0b01 -> bits at pos 1,3 = 1,0
    assert(z((2L, 1L)) == 6L) // 0b0110
    assert(z((1L, 2L)) == 9L) // 0b1001
  }

  test("the exact max clamps into the top bucket") {
    val df = Seq((4.0, 4.0)).toDF("x", "y")
    val z = df.select(Layout.zValue(Seq($"x", $"y"),
      Seq(lit(0.0), lit(0.0)), Seq(lit(4.0), lit(4.0)), bits = 2))
    assert(z.head().getLong(0) == 15L)
  }

  test("constant dimension degenerates to bucket 0, not NaN") {
    val df = Seq((1.0, 7.0), (2.0, 7.0)).toDF("x", "y")
    val z = Layout.withZValue(df, Seq("x", "y"), bits = 4)
      .select("zval").collect().map(_.getLong(0))
    // y contributes nothing; x spans its 4-bit range on even positions
    assert(z.toSet == Set(0L, (0 until 4).map(i => 1L << (2 * i)).sum))
  }

  // the curve LAW that makes z-order prunable: a dyadic prefix box
  // [0, 2^k) x [0, 2^k) maps exactly onto the contiguous z-prefix
  // [0, 4^k) — membership in the box IS a z-range predicate
  test("dyadic prefix boxes are contiguous z-ranges") {
    val bits = 4
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = grid.withColumn("z", Layout.zValue(
      Seq($"x", $"y"), Seq(lit(0.0), lit(0.0)), Seq(lit(16.0), lit(16.0)),
      bits = bits))
    for (k <- 1 to 3) {
      val bound = 1L << k
      val inBox = z.filter($"x" < bound && $"y" < bound)
      val outBox = z.filter($"x" >= bound || $"y" >= bound)
      assert(inBox.agg(max($"z")).head().getLong(0) < (1L << (2 * k)),
        s"k=$k: box escaped its z-prefix")
      assert(outBox.agg(min($"z")).head().getLong(0) >= (1L << (2 * k)),
        s"k=$k: outside point entered the z-prefix")
    }
  }

  // the OPERATIONAL claim: range-partitioning by zval localizes a
  // conjunctive 2-D box into fewer partitions (= files at write time,
  // = pruned scans) than range-partitioning by a single column —
  // exactly why the layout step exists
  test("zval range layout touches fewer partitions for a 2-D box than x-sort") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = grid.withColumn("z", Layout.zValue(
      Seq($"x", $"y"), Seq(lit(0.0), lit(0.0)), Seq(lit(32.0), lit(32.0)),
      bits = 5))
    def partsTouched(laidOut: org.apache.spark.sql.DataFrame): Long =
      laidOut.withColumn("pid", spark_partition_id())
        .filter($"x" < 8 && $"y" < 8)
        .select("pid").distinct().count()
    val zParts = partsTouched(z.repartitionByRange(16, $"z"))
    val xParts = partsTouched(z.repartitionByRange(16, $"x"))
    // the box is 1/16 of the z-range -> ~1-2 partitions; x < 8 alone
    // is 1/4 of the x-range -> ~4 partitions all containing the box
    assert(zParts < xParts,
      s"z-layout touched $zParts partitions, x-sort $xParts")
    assert(zParts <= 2, s"dyadic box should stay in <=2 of 16 z-ranges: $zParts")
  }

  test("zoneMapPruning: overlap semantics, all-null partitions prune, scan fraction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = ((0 to 9).map(v => ("A", Some(v.toLong))) ++
      (20 to 29).map(v => ("B", Some(v.toLong))) ++
      Seq(("C", None), ("C", None))).toDF("p", "v")
    def run(lo: Long, hi: Long) =
      Layout.zoneMapPruning(rows, col("p"), col("v"), lo, hi)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getBoolean(5), r.getDouble(6))).toMap
    // [5,25] overlaps both value partitions; the all-null one prunes
    val mid = run(5L, 25L)
    assert(!mid("A")._2 && !mid("B")._2 && mid("C")._2, s"$mid")
    assert(mid("A")._3 == 0.909091, s"scan fraction: $mid") // 20/22
    // [21,25]: A's zone map (max 9) proves it can't match
    val hi = run(21L, 25L)
    assert(hi("A")._2 && !hi("B")._2, s"$hi")
    assert(hi("B")._3 == 0.454545, s"$hi") // 10/22
    // disjoint range everywhere: scan fraction 0
    assert(run(100L, 200L).values.head._3 == 0.0)
  }

  test("storageTiering: recency relative to the log's own clock, byte shares sum to 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("a", 100L, 10L), ("a", 95L, 10L),  // last 100 -> hot (gap 0)
      ("b", 95L, 30L),                    // gap 5  -> hot
      ("c", 80L, 40L),                    // gap 20 -> warm
      ("d", 50L, 20L))                    // gap 50 -> cold
      .toDF("k", "day", "bytes")
    val out = Layout.storageTiering(rows, "k", col("day"), col("bytes"),
        hotDays = 7L, warmDays = 30L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("hot") == ((2L, 50L, 0.454545)), s"$out")
    assert(out("warm") == ((1L, 40L, 0.363636)), s"$out")
    assert(out("cold") == ((1L, 20L, 0.181818)), s"$out")
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 2e-6)
  }

  test("compactionPlan: sequential-fill bins, big files excluded, per-partition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // P size-desc order 1(50) 2(40) 3(30) 5(20): before 0/50/90/120
    // -> bins 0/0/0/1 at target 100; file 4 (90 >= threshold 80) and
    // the negative-size row are excluded; Q packs alone
    val m = Seq(("P", 1L, 50L), ("P", 2L, 40L), ("P", 3L, 30L),
      ("P", 4L, 90L), ("P", 5L, 20L), ("P", 7L, -5L), ("Q", 6L, 10L))
      .toDF("part", "f", "sz")
    val out = Layout.compactionPlan(m, col("part"), col("f"), col("sz"),
        targetBytes = 100L, smallThreshold = 80L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(("P", 0L)) == ((3L, 120L, "1,2,3")), s"$out")
    assert(out(("P", 1L)) == ((1L, 20L, "5")), s"$out")
    assert(out(("Q", 0L)) == ((1L, 10L, "6")), s"$out")
    assert(out.size == 3)
  }
}
