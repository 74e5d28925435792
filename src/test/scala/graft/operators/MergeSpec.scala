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

  test("scd1 plan: latest-per-key is a partial aggregate, not a window sort") {
    val changes = Seq((1L, 10L, 1L, "upd", Option("x"))).toDF("k", "v", "tie", "op", "c")
    val merged = Merge.scd1(base, changes, "k", Seq("v", "tie"),
      $"op" === "del", Seq("colr" -> "c"))
    val hasWindow = merged.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(hasWindow.isEmpty, "change-log reduction must be max_by, not window rank")
  }
}
