package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (1L, Array(1.0f, 2.5f, -3.25f, 0.125f)),
    (2L, Array(-0.5f, 4.0f, 2.0f, 1.5f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("id", "v")

  test("native dot product is bit-identical to the HOF fold") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        Similarity.dot(col("a.v"), col("b.v")).as("native"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("hof"))
      .collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native norm equals sqrt(dotHof(a,a)) bitwise") {
    val rows = vecs.select(
      Similarity.norm(col("v")).as("native"),
      sqrt(Similarity.dotHof(col("v"), col("v"))).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("ragged pair yields null — native and HOF agree") {
    val ragged = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val r = ragged.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null element yields null — native and HOF agree") {
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(3.0f), Some(4.0f))))
      .toDF("a", "b")
    val r = withNullElem.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("norm of an array with a null element is null, matching the HOF fold") {
    val withNullElem = Seq(Tuple1(Seq(Some(3.0f), None))).toDF("a")
    val r = withNullElem.select(
      Similarity.norm(col("a")).as("native"),
      sqrt(Similarity.dotHof(col("a"), col("a"))).as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null array yields null (nullIntolerant)") {
    val withNull = Seq((1L, Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(Similarity.dot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("expression survives codegen path on a real scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val total = e.select(sum(Similarity.norm(col("embedding")))).collect().head.getDouble(0)
    assert(total > 0)
  }
}
