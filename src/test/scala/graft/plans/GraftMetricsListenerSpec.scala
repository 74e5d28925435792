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
}
