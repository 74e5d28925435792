package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  def df = Seq(
    ("a", Some("2026-08-12 05:00:00"), 1, "old"),
    ("a", Some("2026-08-12 06:00:00"), 2, "new"),
    ("b", Some("2026-08-12 05:30:00"), 3, "only"),
    ("c", None, 4, "nulltime"),
    ("c", Some("2026-08-12 01:00:00"), 5, "timed")
  ).toDF("id", "ts", "seq", "payload")
    .withColumn("ts", to_timestamp($"ts"))

  test("latestPerKey keeps the whole latest row per key") {
    val out = Dedup.latestPerKey(df, Seq("id"), col("ts"), Seq(col("seq")))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("a" -> "new", "b" -> "only", "c" -> "timed"))
  }

  test("latestPerKey: null time never beats a timed row (task.ts:154 ?? 0)") {
    val out = Dedup.latestPerKey(df.filter($"id" === "c"), Seq("id"), col("ts"))
      .collect().head
    assert(out.getString(3) == "timed")
  }

  test("latestPerKey preserves schema/columns") {
    val out = Dedup.latestPerKey(df, Seq("id"), col("ts"))
    assert(out.columns.toSeq == df.columns.toSeq)
  }

  test("latestPerKey deterministic tiebreak on equal time") {
    val tied = Seq(("k", "2026-01-01 00:00:00", 1, "lo"),
                   ("k", "2026-01-01 00:00:00", 9, "hi"))
      .toDF("id", "ts", "seq", "payload")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Dedup.latestPerKey(tied, Seq("id"), col("ts"), Seq(col("seq")))
    assert(out.collect().head.getString(3) == "hi")
  }

  test("window variant agrees with max_by variant") {
    val a = Dedup.latestPerKey(df, Seq("id"), col("ts"), Seq(col("seq")))
      .orderBy("id").collect().toSeq
    val b = Dedup.latestPerKeyWindow(df, Seq("id"), col("ts"), Seq(col("seq")))
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("dedup idempotence (property of SURVEY §5.2)") {
    val once = Dedup.latestPerKey(df, Seq("id"), col("ts"), Seq(col("seq")))
    val twice = Dedup.latestPerKey(once, Seq("id"), col("ts"), Seq(col("seq")))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("exactPerKey: one deterministic survivor per key") {
    val d = Seq(("x", 2, "b"), ("x", 1, "a"), ("y", 5, "z")).toDF("k", "n", "s")
    val out = Dedup.exactPerKey(d, Seq("k")).orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq(("x", 1, "a"), ("y", 5, "z")))
  }
}
