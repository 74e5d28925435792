package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFill: aligned grid, forward fill, at-or-before inclusive") {
    // key 1: obs at 5, 12, 30, step 10 -> grid {10, 20, 30}; the
    // observation exactly ON instant 30 must fill it
    val obs = Seq((1L, 5L, 1.0, 100L), (1L, 12L, 2.0, 101L),
      (1L, 30L, 3.0, 102L)).toDF("k", "us", "v", "id")
    val out = TimeSeries.resampleFill(obs, "k", "us", Seq("v"), 10L, Seq("id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((10L, 1.0), (20L, 2.0), (30L, 3.0)))
  }

  test("resampleFill: equal-instant ties resolve to greatest tiebreak") {
    val obs = Seq((2L, 20L, 5.0, 1L), (2L, 20L, 6.0, 2L))
      .toDF("k", "us", "v", "id")
    val out = TimeSeries.resampleFill(obs, "k", "us", Seq("v"), 10L, Seq("id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((20L, 6.0)))
  }

  test("dateSpine: day count, dow convention, weekend flag, ISO week") {
    val rows = TimeSeries.dateSpine(spark, "2024-01-01", "2024-01-14")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getBoolean(4),
        r.getInt(5)))).toMap
    assert(rows.size == 14)
    assert(rows("2024-01-01") == ((1, false, 1)))  // Monday, ISO week 1
    assert(rows("2024-01-06") == ((6, true, 1)))   // Saturday
    assert(rows("2024-01-07") == ((0, true, 1)))   // Sunday, dow 0
    assert(rows("2024-01-08")._3 == 2)             // ISO week rolls
  }

  test("autocorrelation: ramp +1, alternation -1") {
    import org.apache.spark.sql.functions.col
    val ramp = (1 to 5).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "ts", "v")
    val r = TimeSeries.autocorrelation(ramp, "grp", Seq(col("ts")), "v")
      .collect().head
    assert(r.getDouble(1) == 1.0 && r.getLong(2) == 4L)
    val alt = (1 to 6).map(i => ("g", i.toLong, (i % 2).toDouble))
      .toDF("grp", "ts", "v")
    assert(TimeSeries.autocorrelation(alt, "grp", Seq(col("ts")), "v")
      .collect().head.getDouble(1) == -1.0)
  }

  test("resampleFill: span shorter than a step yields no aligned instants") {
    val obs = Seq((3L, 11L, 1.0, 1L), (3L, 14L, 2.0, 2L))
      .toDF("k", "us", "v", "id")
    assert(TimeSeries.resampleFill(obs, "k", "us", Seq("v"), 10L,
      Seq("id")).isEmpty)
  }
}
