package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the headline queries — the
  * properties the 100 TB design depends on (SCALING.md), pinned so a
  * refactor can't silently regress them:
  * filters/projection reaching the Parquet scan, explicit broadcasts,
  * TakeOrderedAndProject for global top-k, no Window over the big
  * side of dedup, custom expressions surviving into codegen. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter and projection are pushed to the Parquet scan") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters") && p.contains("l_discount"),
      s"no pushed filter:\n$p")
    // pruned ReadSchema: untouched wide columns never leave the scan
    assert(!p.contains("l_comment"), s"unpruned scan:\n$p")
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
  }

  test("q11: dimension tables broadcast, fact side never broadcast") {
    val p = plan("q11_star_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.toLowerCase.contains("cartesianproduct"), s"cartesian:\n$p")
  }

  test("q15: global top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), s"full sort instead of top-k:\n$p")
  }

  test("q05: argmax dedup is a partial-aggregable max_by, not a window sort") {
    val p = plan("q05_latest_per_user")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"no aggregate:\n$p")
    assert(!p.contains("Window"), s"window-sort dedup crept back in:\n$p")
  }

  test("q12/q13: semi and anti joins stay semi/anti in the physical plan") {
    assert(plan("q12_semi_join").contains("LeftSemi"))
    assert(plan("q13_anti_join").contains("LeftAnti"))
  }

  test("q41: rolling-fingerprint expression survives into the physical plan") {
    val p = plan("q41_winnow_pairs")
    assert(p.contains("graft_rolling_fps"), s"expression rewritten away:\n$p")
  }

  test("q28: query side broadcast — the corpus is never shuffled for scoring") {
    val p = plan("q28_cosine_topk")
    assert(p.contains("Broadcast"), s"no broadcast of the query set:\n$p")
    assert(p.contains("graft_dot") && p.contains("graft_norm"),
      s"native similarity expressions missing:\n$p")
  }
}
