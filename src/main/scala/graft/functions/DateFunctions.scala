package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar arithmetic as pure integer Column expressions — the
  * business-day math every warehouse reimplements wrong (loops over
  * days, off-by-one at weekends, engine-specific DAYOFWEEK bases).
  * Everything here works on EPOCH DAY NUMBERS (int64, 1970-01-01 =
  * day 0 = a Thursday), so the closed forms are engine-exact and
  * the oracle dual is the same arithmetic verbatim.
  */
object DateFunctions {

  /** Number of WEEKDAYS (Mon–Fri) in `[0, d)` for an epoch day
    * number `d` — the prefix-sum that turns business-day counting
    * into one subtraction (negative for `d < 0`: weekdays in
    * `[d, 0)`, negated — the signed prefix sum, total over all
    * int64 days). Closed form: 5 per full week plus a 7-case lookup
    * on the FLOORED `d mod 7` (epoch day 0 is a Thursday: the
    * residue window runs Thu, Fri, Sat, Sun, Mon, Tue, Wed). Both
    * engines' `%` truncates toward zero, yielding negative residues
    * pre-1970 — the `(+7)%7` re-floor makes the lookup total
    * instead of silently falling through to the Wednesday case. */
  def weekdaysBefore(d: Column): Column = {
    val r = ((d % 7) + 7) % 7
    // (d - r) is an exact multiple of 7, so the double division is
    // exact and the cast is lossless — both engines' `/` on integers
    // returns double, making the cast the portable integer division
    ((d - r) / 7).cast("long") * 5 +
      when(r === 0, 0L).when(r === 1, 1L).when(r === 2, 2L)
        .when(r === 3, 2L).when(r === 4, 2L).when(r === 5, 3L)
        .otherwise(4L)
  }

  /** Business days in the half-open interval `[d1, d2)` of epoch day
    * numbers (valid over the full signed range, pre-1970 included;
    * the subtraction is antisymmetric in d1/d2). A
    * same-day pair is 0; Friday→Monday is 1 (the Friday). Holidays
    * are a caller-side broadcast-join subtraction — a region-specific
    * TABLE, not calendar math, so it composes instead of hiding
    * here. */
  def businessDaysBetween(d1: Column, d2: Column): Column =
    weekdaysBefore(d2) - weekdaysBefore(d1)
}
