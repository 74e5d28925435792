package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DateFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("businessDaysBetween: calendar facts on the epoch-Thursday window") {
    // epoch day 0 = Thu 1970-01-01; 1 = Fri; 2 = Sat; 3 = Sun; 4 = Mon
    val cases = Seq(
      (0L, 0L, 0L),   // empty interval
      (0L, 1L, 1L),   // [Thu) -> the Thursday counts
      (1L, 4L, 1L),   // Fri -> Mon: only the Friday
      (2L, 3L, 0L),   // Sat -> Sun: nothing
      (4L, 11L, 5L),  // Mon -> next Mon: one full work week
      (0L, 14L, 10L), // two full weeks from Thursday
      (3L, 4L, 0L))   // Sun -> Mon: nothing yet
    val df = cases.toDF("d1", "d2", "expected")
    val out = df.select(col("expected"),
        DateFunctions.businessDaysBetween(col("d1"), col("d2")).as("got"),
        DateFunctions.businessDaysBetween(col("d2"), col("d1")).as("neg"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0), s"$r")
      assert(r.getLong(2) == -r.getLong(0), "antisymmetry broken")
    }
  }

  test("businessDaysBetween: total over pre-1970 days (negative residues)") {
    // epoch day -1 = Wed 1969-12-31; -2 = Tue; -3 = Mon; -4 = Sun;
    // -5 = Sat; -6 = Fri; -7 = Thu. Spark's % yields negative
    // residues here — the floored re-residue must keep the closed
    // form exact across the 1970 boundary and within negative weeks.
    val cases = Seq(
      (-1L, 0L, 1L),   // [Wed): the Wednesday
      (-3L, 0L, 3L),   // Mon, Tue, Wed
      (-5L, -3L, 0L),  // Sat -> Mon start: Sat+Sun only
      (-7L, 0L, 5L),   // Thu..Wed: one full work week
      (-14L, 0L, 10L), // two full weeks
      (-7L, 7L, 10L),  // straddles the epoch: two full work weeks
      (-8L, -7L, 1L))  // [Wed 1969-12-24): one weekday
    val df = cases.toDF("d1", "d2", "expected")
    val out = df.select(col("expected"),
        DateFunctions.businessDaysBetween(col("d1"), col("d2")).as("got"))
      .collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(0), s"$r"))
    // cross-check the whole range [-30, 30) against a day-by-day walk
    val walk = (-30L until 30L).map { d =>
      val dow = (((d + 4) % 7) + 7) % 7 // 0 = Sun ... 6 = Sat
      if (dow >= 1 && dow <= 5) 1L else 0L
    }
    val prefix = walk.scanLeft(0L)(_ + _) // prefix(i) = weekdays in [-30, -30+i)
    val pairs = for (i <- 0 until 60; j <- i until 60)
      yield (-30L + i, -30L + j, prefix(j) - prefix(i))
    val got = pairs.toDF("d1", "d2", "expected")
      .select(col("expected"),
        DateFunctions.businessDaysBetween(col("d1"), col("d2")).as("got"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0), s"$r"))
  }
}
