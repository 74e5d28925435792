package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar spatial primitives over (x, y) point columns. Euclidean
  * arithmetic only (products of identical doubles — engine-exact);
  * for geodetic data, project to a planar CRS upstream and these
  * operators apply unchanged.
  */
object Spatial {

  /** Radius self-join: all unordered point pairs within `radius`,
    * with their squared distance — the spatial blocking pattern
    * (grid cells sized to the radius, candidates only from the 3×3
    * neighborhood) that replaces the quadratic all-pairs join.
    *
    * Scale shape: one side explodes each point to its 9 neighbor
    * cells (a fixed fan-out), the other keeps each point in its home
    * cell, and the match is a plain HASH equi-join on the cell key —
    * never a BETWEEN theta-join (which Spark can only execute as a
    * nested-loop). Work is Σ_cell |probe|·|home| over co-resident
    * cells — local density bounds it, not corpus size; a uniform
    * grid keeps AQE happy and a hot cell is an input-data fact the
    * skew machinery ([[SkewJoin]], AQE skew split) handles like any
    * hot key. Each qualifying pair appears EXACTLY once (the home
    * side's cell is unique, `id1 < id2` dedups orientation). */
  /** Great-circle (haversine) distance in km between two lat/lon
    * points — the geodesic [[neighborPairs]]'s planar d² is not.
    * Spelled with explicit multiplications (never `pow(x, 2)`) and
    * an `asin` clamp so the expression is the same IEEE op sequence
    * on every engine. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    def rad(c: Column) = c * lit(math.Pi / 180.0)
    val sphi = sin((rad(lat2) - rad(lat1)) / 2)
    val slam = sin((rad(lon2) - rad(lon1)) / 2)
    val a = sphi * sphi + cos(rad(lat1)) * cos(rad(lat2)) * slam * slam
    lit(2.0 * 6371.0088) * asin(least(sqrt(a), lit(1.0)))
  }

  /** Geodesic radius self-join: all point pairs within `radiusKm`
    * great-circle distance, via the same 9-cell grid blocking as
    * [[neighborPairs]] but in DEGREE space — `latKmPerDeg` /
    * `lonKmPerDeg` are the caller's worst-case km-per-degree bounds
    * for the data's latitude band (110.574 everywhere for lat;
    * 111.320·cos(φ_max) for lon — pass the PRECOMPUTED number so no
    * trig enters the cell arithmetic). The radius gate compares the
    * ROUNDED distance, so a last-ulp trig difference can never flip
    * a pair's membership. Antimeridian wrap is out of contract
    * (shift longitudes upstream if the data crosses ±180°).
    *
    * Scale shape: identical to [[neighborPairs]] — hash equi-join on
    * 9 candidate cells, never a theta join; pairs exist only within
    * adjacent cells. */
  def haversineNeighbors(points: DataFrame, idCol: String, latCol: String,
                         lonCol: String, radiusKm: Double,
                         latKmPerDeg: Double = 110.574,
                         lonKmPerDeg: Double = 55.66): DataFrame = {
    require(radiusKm > 0 && latKmPerDeg > 0 && lonKmPerDeg > 0)
    val latCell = radiusKm / latKmPerDeg
    val lonCell = radiusKm / lonKmPerDeg
    val home = points
      .filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .select(col(idCol).as("_id"), col(latCol).cast("double").as("_la"),
        col(lonCol).cast("double").as("_lo"))
      .withColumn("_cx", floor(col("_la") / latCell).cast("long"))
      .withColumn("_cy", floor(col("_lo") / lonCell).cast("long"))
    val probe = home.select(col("_id").as("id1"), col("_la").as("_la1"),
        col("_lo").as("_lo1"),
        explode(expr("array(-1L, 0L, 1L)")).as("_dx"), col("_cx"),
        col("_cy"))
      .select(col("id1"), col("_la1"), col("_lo1"),
        (col("_cx") + col("_dx")).as("_cx"),
        explode(expr("array(-1L, 0L, 1L)")).as("_dy"), col("_cy"))
      .select(col("id1"), col("_la1"), col("_lo1"), col("_cx"),
        (col("_cy") + col("_dy")).as("_cy"))
    probe.join(
        home.select(col("_id").as("id2"), col("_la").as("_la2"),
          col("_lo").as("_lo2"), col("_cx"), col("_cy")),
        Seq("_cx", "_cy"))
      .filter(col("id1") < col("id2"))
      .withColumn("d_km", round(haversineKm(col("_la1"), col("_lo1"),
        col("_la2"), col("_lo2")), 6))
      .filter(col("d_km") <= radiusKm)
      .select("id1", "id2", "d_km")
  }

  def neighborPairs(points: DataFrame, idCol: String, xCol: String,
                    yCol: String, radius: Double): DataFrame = {
    require(radius > 0)
    val home = points
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).as("_id"), col(xCol).cast("double").as("_x"),
        col(yCol).cast("double").as("_y"))
      .withColumn("_cx", floor(col("_x") / radius).cast("long"))
      .withColumn("_cy", floor(col("_y") / radius).cast("long"))
    val probe = home.select(col("_id").as("id1"), col("_x").as("_x1"),
        col("_y").as("_y1"),
        explode(expr("array(-1L, 0L, 1L)")).as("_dx"), col("_cx"), col("_cy"))
      .select(col("id1"), col("_x1"), col("_y1"),
        (col("_cx") + col("_dx")).as("_cx"),
        explode(expr("array(-1L, 0L, 1L)")).as("_dy"), col("_cy"))
      .select(col("id1"), col("_x1"), col("_y1"), col("_cx"),
        (col("_cy") + col("_dy")).as("_cy"))
    val d2 = (col("_x1") - col("_x2")) * (col("_x1") - col("_x2")) +
      (col("_y1") - col("_y2")) * (col("_y1") - col("_y2"))
    probe.join(
        home.select(col("_id").as("id2"), col("_x").as("_x2"),
          col("_y").as("_y2"), col("_cx"), col("_cy")),
        Seq("_cx", "_cy"))
      .filter(col("id1") < col("id2"))
      .withColumn("_d2", d2)
      .filter(col("_d2") <= lit(radius * radius))
      .select(col("id1"), col("id2"), round(col("_d2"), 6).as("d2"))
  }

  /** DBSCAN-style density labels WITHOUT the clustering step: every
    * point becomes `core` (≥ minPts neighbors within radius, self
    * excluded), `border` (not core but adjacent to a core), or
    * `noise` — the density triage that answers "is this point in a
    * crowd, at a crowd's edge, or alone" with NO connected-components
    * pass (full DBSCAN clusters = these labels + the engine's
    * existing pointer-doubling CC over core-core pairs, the
    * documented composition). Returns (id, n_neighbors, label).
    *
    * Scale shape: one [[neighborPairs]] grid join (9-cell bucketed,
    * never a theta join), one symmetric explode of the pair table,
    * two key aggs, one broadcast-ready core set semi-join. Exact
    * integer counts; the d² ≤ r² gate is [[neighborPairs]]'s. */
  def densityLabels(points: DataFrame, idCol: String, xCol: String,
                    yCol: String, radius: Double,
                    minPts: Int): DataFrame = {
    require(minPts >= 1)
    val pairs = neighborPairs(points, idCol, xCol, yCol, radius)
    val deg = pairs.select(explode(array(
        struct(col("id1").as("id"), col("id2").as("nb")),
        struct(col("id2").as("id"), col("id1").as("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"))
    val degs = deg.groupBy("id").agg(count(lit(1)).as("n_neighbors"))
    val core = degs.filter(col("n_neighbors") >= minPts).select("id")
    val nearCore = deg
      .join(core.select(col("id").as("nb")), Seq("nb"), "left_semi")
      .select("id").distinct()
      .withColumn("_nc", lit(true))
    points.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).as("id"))
      .join(degs, Seq("id"), "left")
      .join(core.withColumn("_core", lit(true)), Seq("id"), "left")
      .join(nearCore, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_neighbors"), lit(0L))
          .as("n_neighbors"),
        when(col("_core"), "core")
          .when(col("_nc"), "border")
          .otherwise("noise").as("label"))
  }

  /** Per-track movement stats — the GPS-feed summary the reference's
    * domain (satellite trackers) reports per device: ordering each
    * key's points by time, sum the leg lengths (total path distance)
    * and take the fastest leg (peak speed). Returns (key, n_points,
    * path_len rounded 6, max_speed rounded 6); `max_speed` is null
    * when every leg has dt ≤ 0 (single point, or all-tied
    * timestamps). Ref domain: dfpc-coe/etl-inreach task.ts computes
    * per-point speed from the feed; this is its track-level rollup.
    *
    * ENGINE-EXACT: each leg is `sqrt(dx·dx + dy·dy)` — products and
    * sqrt are IEEE-correctly-rounded in every engine, so legs are
    * bit-identical; legs are then quantized to micro-units
    * (`floor(leg·1e6 + 0.5)` as int64) and summed as integers, so
    * the path total is order-free and exact while total path
    * < 2⁴³ units. Speed divides two bit-identical operands
    * (leg / seconds) → per-leg doubles identical; `max` is
    * order-free. The window orders by (ts, x, y): equal-timestamp
    * duplicate points pair ambiguously but contribute identical leg
    * sets either way.
    *
    * Scale shape: ONE hash shuffle on the key + a per-key sort (the
    * unavoidable cost of sequencing a track), then a
    * map-side-combinable agg riding the same partitioning — AQE
    * reuses the exchange. No self-join: lag() makes legs a linear
    * pass. `tsCol` must be integral; `ticksPerSecond` names its unit
    * (1e6 for epoch micros, 1e9 for nanos); x/y planar (see module
    * doc). */
  def trackStats(points: DataFrame, keyCol: String, tsCol: String,
                 xCol: String, yCol: String,
                 ticksPerSecond: Double = 1e9): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_k").orderBy("_t", "_x", "_y")
    val base = points
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("_k"), col(tsCol).cast("long").as("_t"),
        col(xCol).cast("double").as("_x"), col(yCol).cast("double").as("_y"))
    val dx = col("_x") - lag("_x", 1).over(w)
    val dy = col("_y") - lag("_y", 1).over(w)
    val leg = sqrt(dx * dx + dy * dy)
    val dt = col("_t") - lag("_t", 1).over(w)
    base
      .withColumn("_legq",
        floor(leg * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("_spd",
        when(dt > 0, leg / (dt.cast("double") / lit(ticksPerSecond))))
      .groupBy(col("_k").as(keyCol))
      .agg(count(lit(1)).as("n_points"),
        round(coalesce(sum("_legq"), lit(0L)).cast("double") / 1e6, 6)
          .as("path_len"),
        round(max("_spd"), 6).as("max_speed"))
  }

  /** Grid-cell dwell detection — stay-points from a movement stream:
    * bucket points to `cellSize` grid cells, sessionize each
    * (key, cell)'s visits with a `gap` split (same contract as
    * event sessionization q34), and keep sessions lasting at least
    * `minDwell` — "the device stayed HERE for this long". Returns one
    * row per (key, cell_x, cell_y) that has at least one dwell:
    * (key, cell_x, cell_y, n_dwells, longest duration, n_points
    * across dwells). All-integer arithmetic (int64 ticks + counts;
    * `gap`/`minDwell`/`longest` share `tsCol`'s unit) — order-free,
    * engine-exact.
    *
    * Equal timestamps sessionize deterministically: a 0 gap never
    * splits, so tied rows land in one session regardless of their
    * mutual order, and durations (max−min per session) are
    * order-free.
    *
    * Scale shape: one hash shuffle on (key, cell) + per-group sort
    * for the lag/running-flag pass, then the session and cell aggs
    * ride the SAME partitioning (no second exchange; the session
    * grouping only refines the window's). Cells bound the group
    * sizes the way [[neighborPairs]]' grid bounds pair work — a
    * device's history splits across every cell it visited. */
  def dwellCells(points: DataFrame, keyCol: String, tsCol: String,
                 xCol: String, yCol: String, cellSize: Double,
                 gap: Long, minDwell: Long): DataFrame = {
    require(cellSize > 0 && gap > 0 && minDwell >= 0)
    val base = points
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("_k"), col(tsCol).cast("long").as("_t"),
        floor(col(xCol).cast("double") / cellSize).cast("long").as("cell_x"),
        floor(col(yCol).cast("double") / cellSize).cast("long").as("cell_y"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_k", "cell_x", "cell_y").orderBy("_t")
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("_k", "cell_x", "cell_y").orderBy("_t")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base
      .withColumn("_new",
        when(lag("_t", 1).over(w).isNull ||
          col("_t") - lag("_t", 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("_sess", sum("_new").over(run))
      .groupBy(col("_k"), col("cell_x"), col("cell_y"), col("_sess"))
      .agg((max("_t") - min("_t")).as("_dur"), count(lit(1)).as("_n"))
      .filter(col("_dur") >= minDwell)
      .groupBy(col("_k").as(keyCol), col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n_dwells"), max("_dur").as("longest"),
        sum("_n").as("n_points"))
  }

  /** Point-in-polygon geofence tag by the crossing-number rule, on
    * INTEGER-quantized coordinates: a +x ray from the point crosses
    * edge (x₁,y₁)–(x₂,y₂) iff the edge straddles the point's y
    * (half-open: y₁ ≤ p < y₂ or y₂ ≤ p < y₁ — shared vertices count
    * once) and the signed area test
    * (p_x−x₁)(y₂−y₁) − (p_y−y₁)(x₂−x₁) points the right way for the
    * edge's y-direction. Odd crossings = inside. EXACT: every test
    * is int64 products of quantized coordinates — no FP epsilon, no
    * engine drift, boundary behavior fully determined (the standard
    * robust-orientation trick computational geometry uses).
    *
    * The polygon is a query constant (a fence is dozens of vertices,
    * not data), so the whole tag is ONE unrolled codegen projection
    * per point — no join, no explode, scan-speed at any corpus size.
    * Returns the input plus `crossings` and `inside`. */
  def pointInPolygon(points: DataFrame, xCol: Column, yCol: Column,
                     polygon: Seq[(Long, Long)]): DataFrame = {
    require(polygon.size >= 3)
    val edges = polygon.zip(polygon.tail :+ polygon.head)
    val cross = edges.map { case ((x1, y1), (x2, y2)) =>
      val straddles = (lit(y1) <= yCol && yCol < lit(y2)) ||
        (lit(y2) <= yCol && yCol < lit(y1))
      val t = (xCol - lit(x1)) * lit(y2 - y1) -
        (yCol - lit(y1)) * lit(x2 - x1)
      when(straddles &&
        ((lit(y2 > y1) && t < 0) || (lit(y2 < y1) && t > 0)), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    points.withColumn("crossings", cross)
      .withColumn("inside", col("crossings") % 2 === 1)
  }
}
