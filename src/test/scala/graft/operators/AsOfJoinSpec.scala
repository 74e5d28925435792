package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  val orders = Seq(
    (100L, 1L, 50L),  // order at t=50: events 10,40 qualify → 40
    (101L, 1L, 40L),  // order at t=40: event@40 NOT matched (strict) → 10
    (102L, 2L, 99L),  // user 2 has one event at 5
    (103L, 3L, 10L)   // user 3 has no events
  ).toDF("order_id", "cust", "otime")

  val events = Seq(
    (1L, 10L, 1000L, "a"),
    (1L, 40L, 1001L, "b"),
    (1L, 40L, 1002L, "b2"), // equal-time tiebreak: higher event_id wins
    (1L, 60L, 1003L, "c"),
    (2L, 5L, 1004L, "d")
  ).toDF("user", "etime", "event_id", "etype")

  def runUnion = AsOfJoin.asOfUnion(orders, events,
    "cust", "user", col("otime"), col("etime"),
    payload = Seq("event_id", "etype"), tiebreak = Seq("event_id"))

  test("asOfUnion: latest strictly-before event per left row") {
    val out = runUnion.orderBy("order_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
    assert(out(0) == ((100L, Some(1002L), Some("b2")))) // tie at 40 → id 1002
    assert(out(1) == ((101L, Some(1000L), Some("a")))) // strict: event@40 excluded
    assert(out(2) == ((102L, Some(1004L), Some("d"))))
    assert(out(3) == ((103L, None, None))) // no events → null payload
  }

  test("asOfUnion agrees with join+argmax composition on matched rows") {
    val viaJoin = AsOfJoin.asOfJoin(
      orders, events,
      col("cust") === col("user") && col("etime") < col("otime"),
      leftId = Seq("order_id"), ord = Seq(col("etime"), col("event_id")))
      .select("order_id", "event_id", "etype")
      .orderBy("order_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val viaUnion = runUnion.filter(col("event_id").isNotNull)
      .select("order_id", "event_id", "etype")
      .orderBy("order_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(viaJoin.toSeq == viaUnion.toSeq)
  }

  test("asOfUnion: NULL payload on the matched row stays NULL (row semantics)") {
    // the latest predecessor (t=40) carries etype = NULL; per-column
    // carry would fall back to the older row's "old" — row-struct
    // carry must not
    val ev = Seq((1L, 10L, Option("old")), (1L, 40L, Option.empty[String]))
      .toDF("user", "etime", "etype")
    val ord = Seq((100L, 1L, 50L)).toDF("order_id", "cust", "otime")
    val out = AsOfJoin.asOfUnion(ord, ev, "cust", "user",
        col("otime"), col("etime"),
        payload = Seq("etype"), tiebreak = Seq("etime"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("etype")),
      s"NULL payload on matched row leaked an older value: $out")
    // with tolerance: the matched row (Δ=10 ≤ 15) gates the OLDER row's
    // value out even though that row (Δ=40) is beyond tolerance
    val tol = AsOfJoin.asOfUnion(ord, ev, "cust", "user",
        col("otime"), col("etime"),
        payload = Seq("etype"), tiebreak = Seq("etime"),
        tolerance = Some(15L))
      .collect().head
    assert(tol.isNullAt(tol.fieldIndex("etype")))
  }

  test("asOfUnion tolerance: stale matches are nulled, in-window ones kept") {
    val out = AsOfJoin.asOfUnion(orders, events,
        "cust", "user", col("otime"), col("etime"),
        payload = Seq("event_id", "etype"), tiebreak = Seq("event_id"),
        tolerance = Some(15L))
      .orderBy("order_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out(0) == ((100L, Some(1002L)))) // Δ = 50-40 = 10 ≤ 15 → kept
    // order 101: latest predecessor is event@10, Δ = 30 > 15 → nulled
    // (and since the LATEST is stale, no candidate can be fresher)
    assert(out(1) == ((101L, None)))
    assert(out(2) == ((102L, None))) // Δ = 99-5 = 94 > 15
    assert(out(3) == ((103L, None))) // never matched stays null
    // boundary: Δ = exactly tolerance is kept
    val edge = AsOfJoin.asOfUnion(orders, events,
        "cust", "user", col("otime"), col("etime"),
        payload = Seq("event_id"), tiebreak = Seq("event_id"),
        tolerance = Some(10L))
      .filter(col("order_id") === 100L).collect().head
    assert(edge.get(3) == 1002L)
  }

  test("asOfNearest forward: earliest at-or-after, least-id tie, null when none follow") {
    val left = Seq((1L, "u", 50L), (2L, "u", 90L)).toDF("lid", "k", "lt")
    // rights: two at t=50 (ids 7, 3 → least wins), one at 80
    val right = Seq(("u", 50L, 7L), ("u", 50L, 3L), ("u", 80L, 9L))
      .toDF("rk", "rt", "rid")
    val out = AsOfJoin.asOfNearest(left, right, "k", "rk",
        col("lt"), col("rt"), Seq("rid"), Seq("rid"), direction = "forward")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L) == Some(3L)) // exact match included, least id
    assert(out(2L) == None)     // nothing at/after 90
  }

  test("asOfNearest: exact match beats closer-side, equal distance prefers backward") {
    val left = Seq((1L, "u", 100L), (2L, "u", 200L)).toDF("lid", "k", "lt")
    val right = Seq(
      ("u", 100L, 1L),           // exact for lid 1
      ("u", 97L, 2L),            // backward Δ3 for lid 1
      ("u", 195L, 3L),           // backward Δ5 for lid 2
      ("u", 205L, 4L))           // forward Δ5 for lid 2 → backward wins
      .toDF("rk", "rt", "rid")
    val out = AsOfJoin.asOfNearest(left, right, "k", "rk",
        col("lt"), col("rt"), Seq("rid"), Seq("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 1L)
    assert(out(2L) == 3L)
  }

  test("asOfNearest tolerance nulls far matches but keeps the row") {
    val left = Seq((1L, "u", 100L)).toDF("lid", "k", "lt")
    val right = Seq(("u", 150L, 9L)).toDF("rk", "rt", "rid")
    val out = AsOfJoin.asOfNearest(left, right, "k", "rk",
        col("lt"), col("rt"), Seq("rid"), Seq("rid"),
        tolerance = Some(10L)).collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }
}
