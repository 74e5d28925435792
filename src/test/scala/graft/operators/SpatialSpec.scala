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

  test("trackStats: 3-4-5 legs, peak speed on the fast leg, key isolation") {
    // u: (0,0) t=0 → (3,4) t=5e9 (leg 5, 1 unit/s) → (3,1) t=6e9
    // (leg 3, 3 units/s — the peak); v: single point → 0 path, null speed
    val pts = Seq(("u", 0L, 0.0, 0.0), ("u", 5000000000L, 3.0, 4.0),
      ("u", 6000000000L, 3.0, 1.0), ("v", 0L, 9.0, 9.0))
      .toDF("k", "t", "x", "y")
    val out = Spatial.trackStats(pts, "k", "t", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
    assert(out("u") == ((3L, 8.0, Some(3.0))))
    assert(out("v") == ((1L, 0.0, None)))
  }

  test("trackStats: zero-dt legs add distance but never speed") {
    val pts = Seq(("u", 1L, 0.0, 0.0), ("u", 1L, 6.0, 8.0))
      .toDF("k", "t", "x", "y")
    val r = Spatial.trackStats(pts, "k", "t", "x", "y").collect().head
    assert(r.getDouble(2) == 10.0 && r.isNullAt(3))
  }

  test("dwellCells: gap splits sessions, minDwell gates, cells isolate") {
    // cell (0,0): visits at t=0,10,20 (one 20-ns dwell), then t=100
    // (gap>30 → new 1-point session, dur 0 < 15 dropped);
    // cell (1,0): t=0,5 → dur 5 < 15 dropped
    val pts = Seq(("u", 0L, 1.0, 1.0), ("u", 10L, 2.0, 2.0),
      ("u", 20L, 3.0, 3.0), ("u", 100L, 1.0, 1.0),
      ("u", 0L, 12.0, 3.0), ("u", 5L, 13.0, 2.0))
      .toDF("k", "t", "x", "y")
    val out = Spatial.dwellCells(pts, "k", "t", "x", "y",
        cellSize = 10.0, gap = 30L, minDwell = 15L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("u", 0L, 0L, 1L, 20L, 3L)))
  }

  test("densityLabels: core crowd, edge border, lone noise") {
    import spark.implicits._
    // 4-point crowd (mutual neighbors, >= 3 each), one edge point
    // touching two cores, one point alone
    val p = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5),
      (4L, 0.5, 0.5), (5L, 2.3, 0.0), (6L, 10.0, 10.0))
      .toDF("id", "x", "y")
    val out = Spatial.densityLabels(p, "id", "x", "y", radius = 2.0,
        minPts = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert((1L to 4L).forall(i => out(i)._2 == "core"), s"crowd: $out")
    assert(out(5L) == ((2L, "border")), s"edge point: $out")
    assert(out(6L) == ((0L, "noise")), s"loner: $out")
  }

  test("haversineNeighbors: textbook distances, radius gate, cross-cell pairs") {
    import org.apache.spark.sql.functions.col
    // 1 deg of longitude at the equator ~ 111.19 km
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 1.0), (3L, 0.0, 2.2),
      (4L, 45.0, 100.0)).toDF("pid", "lat", "lon")
    val out = Spatial.haversineNeighbors(pts, "pid", "lat", "lon",
        radiusKm = 120.0, latKmPerDeg = 110.574, lonKmPerDeg = 111.32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // (1,2) spans a cell boundary (cells ~1.08 deg) and is in radius
    assert(out.keySet == Set((1L, 2L)), s"$out")
    assert(math.abs(out((1L, 2L)) - 111.195) < 0.01, s"$out")
    // point 3 is ~244 km from 1 (outside), ~133 km from 2 (outside)
    // at a wider radius the chain appears, still never (1,3)
    val wide = Spatial.haversineNeighbors(pts, "pid", "lat", "lon",
        radiusKm = 140.0, latKmPerDeg = 110.574, lonKmPerDeg = 111.32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == Set((1L, 2L), (2L, 3L)), s"$wide")
  }

  test("pointInPolygon: square and concave hexagon, exact integer tests") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = Seq((1L, 5L, 5L), (2L, 15L, 5L), (3L, 5L, 10L))
      .toDF("id", "x", "y")
    val out = Spatial.pointInPolygon(pts, col("x"), col("y"), sq)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false), s"$out")
    // the registered concave hexagon: interior + exterior anchors
    val hexa = Seq((500L, 500L), (2500L, 400L), (2600L, 2000L),
      (1500L, 1200L), (900L, 2600L), (400L, 1800L))
    val p2 = Seq((1L, 1500L, 1000L), (2L, 100L, 100L), (3L, 2550L, 1500L))
      .toDF("id", "x", "y")
    val o2 = Spatial.pointInPolygon(p2, col("x"), col("y"), hexa)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(o2 == Map(1L -> true, 2L -> false, 3L -> true), s"$o2")
  }
}
