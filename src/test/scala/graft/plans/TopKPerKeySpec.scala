package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def sample = {
    val rnd = new scala.util.Random(31)
    (1 to 5000).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(50).toDouble))
      .toDF("id", "k", "v").repartition(16)
  }

  test("topKPerKey equals the window-rank formulation (ties broken by id)") {
    val df = sample
    val got = TopK.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.size == 40 * 3)
  }

  test("plans partial -> exchange -> final; exchange elided when pre-clustered") {
    val df = sample
    val plan = TopK.topKPerKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"),
      s"custom operators missing:\n$plan")
    assert(plan.contains("Exchange"), s"no exchange between partial and final:\n$plan")
    // pre-clustered child satisfies ClusteredDistribution(keys): the
    // strategy's final exec needs NO additional exchange beyond the
    // repartition itself
    val clustered = TopK.topKPerKey(df.repartition(col("k")), Seq("k"),
        Seq(col("v").desc, col("id").asc), 2)
      .queryExecution.executedPlan.toString
    assert(clustered.split("Exchange").length - 1 == 1,
      s"expected exactly the repartition exchange:\n$clustered")
  }

  test("k larger than any group passes everything through; groups smaller than k intact") {
    val df = Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 2L, 3.0)).toDF("id", "k", "v")
    val got = TopK.topKPerKey(df, Seq("k"), Seq(col("v").asc), 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("partial flush at maxKeys: re-reduced candidate superset equals unbounded result") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, RowOrdering, SortOrder, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.LongType
    def rows(): Iterator[InternalRow] =
      // 12 keys interleaved so every flush segment straddles keys
      (1 to 240).iterator.map(i =>
        new GenericInternalRow(Array[Any]((i % 12).toLong, (i * 37 % 101).toLong)))
    def keyProj() = UnsafeProjection.create(
      Seq(BoundReference(0, LongType, nullable = false)))
    def ord() = RowOrdering.create(
      Seq(SortOrder(BoundReference(1, LongType, nullable = false), Ascending)), Nil)
    def collect(it: Iterator[InternalRow]): Seq[(Long, Long)] =
      it.map(r => (r.getLong(0), r.getLong(1))).toSeq
    val k = 3
    val unbounded = collect(
      graft.plans.TopKPartition.topK(rows(), keyProj(), ord(), k)).toSet
    // flushing map of 4 keys: output is a SUPERSET of survivors…
    val flushed = collect(
      graft.plans.TopKPartition.topK(rows(), keyProj(), ord(), k, maxKeys = 4))
    assert(unbounded.subsetOf(flushed.toSet),
      s"flush lost survivors: ${unbounded diff flushed.toSet}")
    // …which the final (unbounded) pass reduces to exactly the answer
    val reduced = collect(graft.plans.TopKPartition.topK(
      flushed.iterator.map(t => new GenericInternalRow(Array[Any](t._1, t._2))),
      keyProj(), ord(), k)).toSet
    assert(reduced == unbounded, s"diff=${(reduced diff unbounded) ++ (unbounded diff reduced)}")
  }

  test("property: random data/k/partitioning equals driver-side sorted take") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(5)
      val rows = (1 to 500).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(10).toDouble)) // heavy ties
      val got = TopK.topKPerKey(
          rows.toDF("id", "g", "v").repartition(1 + rnd.nextInt(9)),
          Seq("g"), Seq(col("v").desc, col("id").asc), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = rows.groupBy(_._2).flatMap { case (_, grp) =>
        grp.sortBy(t => (-t._3, t._1)).take(k)
      }.toSet
      assert(got == want, s"seed=$seed k=$k diff=${(want -- got) ++ (got -- want)}")
    }
  }
}
