package graft.operators

import org.apache.spark.sql.DataFrame
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
}
