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
}
