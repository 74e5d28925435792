package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (SURVEY.md "Optimize for scale"):
  * two tables bucketed by the join key join WITHOUT a shuffle — the
  * physical plan contains no ShuffleExchange on either side. This is
  * the 100 TB pattern for repeated fact-fact joins: pay the
  * partitioning once at write time, reuse it on every query. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedJoin.coLocatedJoin(orders, customer,
        "o_custkey", "c_custkey", 8, "b_orders", "b_customer")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // and it is still correct
      val n = joined.count()
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(n == expected && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("coLocatedJoin resolves same-named keys on both sides") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "av")
    val b = Seq((1L, "X"), (3L, "Z")).toDF("k", "bv")
    try {
      val joined = BucketedJoin.coLocatedJoin(a, b, "k", "k", 4, "b_same_a", "b_same_b")
      assert(joined.count() == 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_same_a")
      spark.sql("DROP TABLE IF EXISTS b_same_b")
    }
  }
}
