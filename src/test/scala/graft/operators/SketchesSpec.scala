package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct estimate lands within ~10% of exact on 2000 distinct values") {
    val rows = (1 to 6000).map(i => s"value-${i % 2000}").toDF("v")
    val r = Sketches.hllDistinct(rows, "v").collect().head
    val est = r.getDouble(0)
    val exact = r.getLong(1)
    assert(exact == 2000L)
    assert(math.abs(est - exact) / exact < 0.10, s"est=$est exact=$exact")
  }

  test("hllDistinct is duplicate-insensitive") {
    val once = Sketches.hllDistinct((1 to 500).map(i => s"x$i").toDF("v"), "v")
      .collect().head.getDouble(0)
    val dup = Sketches.hllDistinct(
      ((1 to 500) ++ (1 to 500)).map(i => s"x$i").toDF("v"), "v")
      .collect().head.getDouble(0)
    assert(once == dup)
  }

  test("saltedJoin result equals plain join result") {
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "lv")
    val right = Seq((1L, "X"), (2L, "Y")).toDF("rk", "rv")
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", col("lv"), 4)
      .select("k", "lv", "rv").orderBy("k", "lv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "lv", "rv").orderBy("k", "lv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }
}
