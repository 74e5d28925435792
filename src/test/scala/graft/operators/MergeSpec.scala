package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  val base = Seq((1L, "a", "red"), (2L, "b", "blue"), (3L, "c", "green"))
    .toDF("k", "name", "colr")

  test("scd1: update / delete / insert / untouched / absent-delete / superseded tombstone") {
    val changes = Seq(
      (1L, 10L, 1L, "upd", Option("gold")),  // update k=1
      (1L, 5L, 5L, "del", None),             // older tombstone, superseded
      (2L, 10L, 2L, "del", None),            // delete k=2
      (4L, 10L, 3L, "upd", Option("pink")),  // insert k=4
      (5L, 10L, 4L, "del", None)             // delete for absent key: no-op
    ).toDF("k", "v", "tie", "op", "c")
    val out = Merge.scd1(base, changes, "k", Seq("v", "tie"),
        $"op" === "del", Seq("colr" -> "c"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSet
    assert(out == Set(
      (1L, Some("a"), Some("gold")),   // updated, name kept
      (3L, Some("c"), Some("green")),  // untouched
      (4L, None, Some("pink"))))       // inserted, base attrs NULL
  }

  test("snapshotDiff: insert/update/delete classification; null-safe compare") {
    val old = Seq((1L, "a", Option(1.0)), (2L, "b", Option.empty[Double]),
      (3L, "c", Option(3.0))).toDF("k", "name", "v")
    val neu = Seq((1L, "a", Option(1.0)), (2L, "b", Option(2.0)),
      (4L, "d", Option.empty[Double])).toDF("k", "name", "v")
    val out = Merge.snapshotDiff(old, neu, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // k=1 unchanged -> dropped; k=2 NULL->2.0 is a change; k=3 only
    // in old; k=4 only in new (with a NULL attribute)
    assert(out == Set((2L, "update"), (3L, "delete"), (4L, "insert")))
  }

  test("snapshotDiff: a table diffed against itself is empty") {
    assert(Merge.snapshotDiff(base, base, Seq("k")).isEmpty)
  }

  test("aggIncrement: folded deltas equal the one-shot aggregate") {
    val all = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (2L, -3.0),
      (3L, 7.0), (1L, 30.0)).toDF("k", "v")
    // batches split so key 1 spans all three, key 3 only the last
    val batches = Seq(all.limit(2), all.offset(2).limit(2), all.offset(4))
    val folded = batches.tail.foldLeft(
        Merge.aggInit(batches.head, Seq("k"), "v")) { (st, d) =>
      Merge.aggIncrement(st, d, Seq("k"), "v") }
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val oneShot = Merge.aggInit(all, Seq("k"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(folded == oneShot)
    assert(folded == Set((1L, 3L, 60.0, 10.0, 30.0),
      (2L, 2L, 2.0, -3.0, 5.0), (3L, 1L, 7.0, 7.0, 7.0)))
  }

  test("scd1: latest change wins among several updates, tiebreak included") {
    val changes = Seq(
      (1L, 10L, 1L, "upd", Option("first")),
      (1L, 20L, 1L, "upd", Option("mid")),
      (1L, 20L, 2L, "upd", Option("last"))   // same version, higher tie
    ).toDF("k", "v", "tie", "op", "c")
    val out = Merge.scd1(base, changes, "k", Seq("v", "tie"),
        $"op" === "del", Seq("colr" -> "c"))
      .filter($"k" === 1L).collect().head
    assert(out.getString(2) == "last")
  }

  test("property: random CDC logs match a driver-side reference merge") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val baseRows = (0L until 30L).map(k => (k, s"n$k", s"c${rnd.nextInt(5)}"))
      // tie = unique log index: versionCols' contract is a TOTAL order
      val changeRows = Seq.tabulate(60)(i => (rnd.nextInt(40).toLong,
        rnd.nextInt(20).toLong, i.toLong,
        if (rnd.nextInt(4) == 0) "del" else "upd", Option(s"v${rnd.nextInt(9)}")))
      // reference: latest by (v, tie) per key, then apply
      val latest = changeRows.groupBy(_._1).map { case (k, ch) =>
        k -> ch.maxBy(c => (c._2, c._3)) }
      val want = (baseRows.map(_._1) ++ latest.keys).distinct.sorted.flatMap { k =>
        val b = baseRows.find(_._1 == k)
        latest.get(k) match {
          case Some(c) if c._4 == "del" => None
          case Some(c) => Some((k, b.map(_._2).orNull, c._5.orNull))
          case None => b.map(x => (k, x._2, x._3))
        }
      }.toSet
      val got = Merge.scd1(
          baseRows.toDF("k", "name", "colr"),
          changeRows.toDF("k", "v", "tie", "op", "c"),
          "k", Seq("v", "tie"), $"op" === "del", Seq("colr" -> "c"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == want, s"seed=$seed: ${(got diff want) ++ (want diff got)}")
    }
  }

  test("scd1 plan: latest-per-key is a partial aggregate, not a window sort") {
    val changes = Seq((1L, 10L, 1L, "upd", Option("x"))).toDF("k", "v", "tie", "op", "c")
    val merged = Merge.scd1(base, changes, "k", Seq("v", "tie"),
      $"op" === "del", Seq("colr" -> "c"))
    val hasWindow = merged.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(hasWindow.isEmpty, "change-log reduction must be max_by, not window rank")
  }

  test("scd2History: versions open/close correctly; heartbeats collapse") {
    // key A: x@10, x@20 (heartbeat), y@30, y@40 (heartbeat), x@50
    //   → (x,[10,30)) (y,[30,50)) (x,[50,∞)); key B single change
    val log = Seq(("A", 10L, "x", 1L), ("A", 20L, "x", 2L),
      ("A", 30L, "y", 3L), ("A", 40L, "y", 4L), ("A", 50L, "x", 5L),
      ("B", 7L, "z", 6L)).toDF("k", "ts", "status", "id")
    val h = Merge.scd2History(log, "k", "ts", Seq("status"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(h == Set(("A", "x", 10L, 30L), ("A", "y", 30L, 50L),
      ("A", "x", 50L, -1L), ("B", "z", 7L, -1L)))
  }

  test("scd2History: null attribute transitions are null-safe") {
    val log = Seq(("A", 1L, Some("x"), 1L), ("A", 2L, None, 2L),
      ("A", 3L, None, 3L), ("A", 4L, Some("x"), 4L))
      .toDF("k", "ts", "status", "id")
    val h = Merge.scd2History(log, "k", "ts", Seq("status"), Seq("id"))
      .collect().map(r => (Option(r.getString(1)), r.getLong(2)))
    // NULL→NULL collapses; x→NULL and NULL→x are real versions
    assert(h.toSet == Set((Some("x"), 1L), (None, 2L), (Some("x"), 4L)))
  }

  test("pointInTime: facts pick the version covering their time") {
    val log = Seq(("A", 10L, "x", 1L), ("A", 30L, "y", 2L),
      ("A", 50L, "x", 3L)).toDF("k", "ts", "status", "id")
    val h = Merge.scd2History(log, "k", "ts", Seq("status"), Seq("id"))
    val facts = Seq(("A", 5L), ("A", 10L), ("A", 29L), ("A", 30L),
      ("A", 99L), ("C", 40L)).toDF("k", "t")
    val out = Merge.pointInTime(facts, h, "k", col("t"), Seq("status"))
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set((5L, None),          // before first version
      (10L, Some("x")),                    // inclusive open boundary
      (29L, Some("x")), (30L, Some("y")),  // half-open close boundary
      (99L, Some("x")),                    // current (valid_to NULL)
      (40L, None)))                        // key with no history
  }

  test("goldenRecord: attributes survive from different rows; gaps never win") {
    val rows = Seq(
      // key A: email set at t1, phone at t2 (email null), email
      // updated at t3 (phone null) -> golden = (email@t3, phone@t2)
      ("A", 1L, Some("a1@x"), None: Option[String]),
      ("A", 2L, None, Some("111")),
      ("A", 3L, Some("a3@x"), None),
      // key B: only nulls for phone -> phone stays null
      ("B", 1L, Some("b@x"), None)
    ).toDF("k", "v", "email", "phone")
    val got = Merge.goldenRecord(rows, "k", Seq("v"),
        Seq("email", "phone"))
      .collect().map(r => (r.getString(0),
        (Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(got("A") == (Some("a3@x"), Some("111")))
    assert(got("B") == (Some("b@x"), None))
  }

  test("incrementalJoinAgg: view + 3 delta terms equals the full recompute") {
    import org.apache.spark.sql.functions._
    // key 30 exists ONLY in the deltas on both sides: the cross term
    // deltaA x deltaB is load-bearing, not decorative
    val aAll = Seq((10L, "g1"), (20L, "g1"), (30L, "g2"))
      .toDF("ak", "grp")
    val bAll = Seq((10L, 5L), (10L, 7L), (20L, 1L), (30L, 100L))
      .toDF("bk", "v")
    val (aB, aD) = (aAll.filter($"ak" < 30), aAll.filter($"ak" >= 30))
    val (bB, bD) = (bAll.filter($"v" =!= 100L && $"v" =!= 7L),
      bAll.filter($"v" === 100L || $"v" === 7L))
    val view = aB.join(bB, $"ak" === $"bk").groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"v").as("val"))
    val got = Merge.incrementalJoinAgg(view, aB, aD, bB, bD,
        "ak", "bk", "grp", col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val full = aAll.join(bAll, $"ak" === $"bk").groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"v").as("val"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == full, s"$got vs $full")
    assert(got("g2") == ((1L, 100L)), "delta-only key lost")
  }

  test("merkleDiff: equal tables silent; tamper and insert localize to buckets") {
    import org.apache.spark.sql.functions._
    val a = (1L to 200L).map(i => (i, s"payload-$i")).toDF("id", "text")
    assert(Merge.merkleDiff(a, a, "id", col("text"), 16).isEmpty,
      "equal tables must produce no rows")
    // one tampered payload: exactly one bucket flags 'diff', counts equal
    val tampered = a.withColumn("text",
      when($"id" === 5L, lit("corrupted")).otherwise($"text"))
    val d = Merge.merkleDiff(a, tampered, "id", col("text"), 16).collect()
    assert(d.length == 1 && d.head.getString(3) == "diff", s"${d.toSeq}")
    assert(d.head.getLong(1) == d.head.getLong(2), s"${d.toSeq}")
    // an inserted row flags its bucket (diff via count mismatch)
    val grown = a.union(Seq((999L, "new")).toDF("id", "text"))
    val g = Merge.merkleDiff(a, grown, "id", col("text"), 16).collect()
    assert(g.length == 1 && g.head.getLong(2) == g.head.getLong(1) + 1,
      s"${g.toSeq}")
  }
}
