package graft

import org.apache.spark.sql.functions._

/** The harness feed's `ts` column has drifted across driver testdata
  * snapshots: timestamp[ns] (read as BIGINT nanos under
  * `nanosAsLong`) vs timestamp[us] NTZ (read as a real timestamp).
  * SparkEntry.normTs must make registered queries byte-equal across
  * both physical shapes — this pins the shim end-to-end through a
  * registered query rather than unit-testing the private helper. */
class TsShimSpec extends SparkSpec {

  test("registered query results are invariant to the feed's physical ts type") {
    import spark.implicits._
    val base = 1700000000000000000L // 2023-11-14T22:13:20Z in ns
    val rows = (1 to 200).map { i =>
      // whole-microsecond ns values: both shapes carry identical instants
      (i.toLong, base + i.toLong * 60000000000L, (i % 7).toLong,
        Seq("click", "view", "purchase")(i % 3), i * 1.5, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val longDir = java.nio.file.Files.createTempDirectory("ts-long")
    df.coalesce(1).write.mode("overwrite")
      .parquet(longDir.resolve("events.parquet").toString)

    val ntzDir = java.nio.file.Files.createTempDirectory("ts-ntz")
    df.withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      .coalesce(1).write.mode("overwrite")
      .parquet(ntzDir.resolve("events.parquet").toString)

    for (q <- Seq("q05_latest_per_user", "q09_time_bucket")) {
      val a = SparkEntry.queries(q)(spark, longDir.toString)
        .collect().map(_.toString).sorted.toSeq
      val b = SparkEntry.queries(q)(spark, ntzDir.toString)
        .collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$q returned no rows")
      assert(a == b, s"$q diverges between BIGINT-nanos and timestamp[us] feeds")
    }
  }
}
