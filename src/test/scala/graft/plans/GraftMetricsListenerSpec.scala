package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftMetricsListenerSpec extends SparkSpec {
  import spark.implicits._

  test("listener captures duration, shuffle count, and codegen spans per action") {
    val m = new GraftMetricsListener
    spark.listenerManager.register(m)
    try {
      m.drain() // discard anything from earlier suites
      // one shuffle (groupBy), codegen'd
      (1 to 1000).toDF("x").groupBy($"x" % 7).count().collect()
      // the listener bus delivers asynchronously; poll briefly
      var got = m.drain()
      var waited = 0
      while (got.isEmpty && waited < 5000) {
        Thread.sleep(100); waited += 100; got = m.drain()
      }
      assert(got.nonEmpty, "no metrics captured")
      val a = got.head
      assert(!a.failed && a.durationNs > 0)
      assert(a.shuffles >= 1, s"groupBy must show its exchange: $a")
      assert(a.codegenSpans >= 1, s"plan left codegen: $a")
    } finally spark.listenerManager.unregister(m)
  }

  test("a shuffle-free projection reports zero exchanges") {
    val m = new GraftMetricsListener
    spark.listenerManager.register(m)
    try {
      m.drain()
      (1 to 100).toDF("x").select(($"x" * 2).as("y")).collect()
      var got = m.drain()
      var waited = 0
      while (got.isEmpty && waited < 5000) {
        Thread.sleep(100); waited += 100; got = m.drain()
      }
      assert(got.nonEmpty && got.head.shuffles == 0, s"${got.headOption}")
    } finally spark.listenerManager.unregister(m)
  }

  // the walk must descend AdaptiveSparkPlanExec.executedPlan and
  // QueryStageExec.plan (both AQE leaves hiding the real subtree),
  // skip ReusedExchange (already counted at its origin), and never
  // count BroadcastExchange as a shuffle
  test("AQE tree walk: broadcast exchanges and reuse are not shuffles") {
    val m = new GraftMetricsListener
    spark.listenerManager.register(m)
    def await(): Seq[m.ActionMetrics] = {
      var got = m.drain(); var waited = 0
      while (got.isEmpty && waited < 5000) {
        Thread.sleep(100); waited += 100; got = m.drain()
      }
      got
    }
    try {
      m.drain()
      // broadcast join: exactly zero shuffles despite a (Broadcast)
      // Exchange node in the executed plan
      val dim = broadcast((1 to 10).toDF("k"))
      (1 to 1000).toDF("k").join(dim, "k").collect()
      val bj = await()
      assert(bj.nonEmpty && bj.head.shuffles == 0,
        s"broadcast exchange miscounted as shuffle: ${bj.headOption}")
      m.drain()
      // self-union of one aggregate: AQE reuses the exchange — the
      // plan carries ONE real shuffle plus a ReusedExchange pointer,
      // which must not double the count
      val agg = (1 to 1000).toDF("x").groupBy(($"x" % 7).as("g")).count()
      agg.union(agg).collect()
      val ru = await()
      assert(ru.nonEmpty && ru.head.shuffles == 1,
        s"reused exchange double-counted: ${ru.headOption}")
      assert(ru.head.codegenSpans >= 1, s"AQE plan lost codegen spans: ${ru.head}")
    } finally spark.listenerManager.unregister(m)
  }
}
