package graft.operators

import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("neighborPairs: inclusive radius, cross-cell pairs, uniqueness") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 3.0, 0.0),
      (4L, 10.0, 10.0)).toDF("id", "x", "y")
    val out = Spatial.neighborPairs(pts, "id", "x", "y", radius = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == out.distinct.length)
    // (1,2) d²=1; (2,3) d²=4 exactly on the inclusive boundary and
    // ACROSS cells 0|1; (1,3) d²=9 excluded; 4 isolated
    assert(out.toSet == Set((1L, 2L, 1.0), (2L, 3L, 4.0)))
  }

  test("neighborPairs equals brute force on a deterministic cloud") {
    val cloud = (0 until 80).map(i =>
      (i.toLong, (i * 37 % 100) / 7.0, (i * 53 % 100) / 9.0))
    val r = 1.5
    val brute = (for {
      a <- cloud; b <- cloud if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, math.rint(d2 * 1e6) / 1e6)).toSet
    val got = Spatial.neighborPairs(cloud.toDF("id", "x", "y"),
        "id", "x", "y", r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == brute && brute.nonEmpty)
  }
}
