package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Prices the two standing-index LAYOUTS of the IVF-PQ serve in the
  * layout's INTENDED regime — cells ≫ buckets (SCALING.md round 12; a
  * measurement main, never part of the query surface).
  *
  * Round 11 registered the production partitionBy(part)+bucketBy(16,
  * cell) layout (q476) but could only price it at q326's 8-cell
  * parity build, where cells(8) < buckets(16) serializes the bucketed
  * scan onto ≤8 populated buckets — the one regime the layout is NOT
  * for. This main builds ONE index at a corpus-scaled cell count
  * (cells ≫ 16) and writes it in BOTH layouts:
  *
  *   - partitioned: partitionBy(part, c) — a directory per cell, the
  *     q326 layout (dynamic partition pruning skips unprobed cells);
  *   - bucketed: partitionBy(part) + bucketBy(16, c) — cells
  *     co-located in 16 fixed buckets, the q476 layout (the probe
  *     join consumes the bucketing; no Exchange over the assign part).
  *
  * then serves the q326/q476 query shape (20 probes, top-3, nprobe 4,
  * rerank 50) over each, interleaved min-of-N so neither layout rides
  * a warmer page cache, and asserts the two serves return IDENTICAL
  * rows (the layouts' interchangeability, checked where no DuckDB
  * oracle reaches). Layout WRITE times are reported too — the
  * metadata cost the 100 TB argument is about (directory count grows
  * with cells in the partitioned layout, is fixed in the bucketed).
  *
  * Usage: `runMain graft.LayoutProfile [corpusDir] [cells] [passes]
  * [buckets]` (defaults /tmp/scale100, 128, 3, 16). The buckets arg
  * sweeps the OTHER layout constant (VERDICT r12 item 3: the rule is
  * "cells ≫ buckets", but 16 was a constant chosen at sf0.1 — a
  * 100 TB operator provisions buckets against cluster width). Prints
  * one line per timed arm plus a summary; writes nothing durable
  * (tmp dirs + the temp-warehouse catalog table are removed in a
  * finally, even when the interchangeability require() throws).
  */
object LayoutProfile {
  private def rmTree(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
          catch { case _: Throwable => () })
    } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100")
    val cells = args.lift(1).map(_.toInt).getOrElse(128)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val buckets = args.lift(3).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft-layout-wh")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm

    val idxTmp = java.nio.file.Files.createTempDirectory("graft-layout")
    val tbl = "graft_layout_bucketed"
    try {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    println(s"[layout] corpus $dir: $n vectors, cells=$cells, " +
      s"buckets=$buckets (cells/buckets = ${cells.toDouble / buckets})")

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[layout] $label: $dt%.2f s ($rows rows)")
      dt
    }

    // ONE build, shared by both layout writes: the layouts must hold
    // identical rows for the serve comparison to be pure layout. The
    // build itself is timed once for context (the nightly-rebuild
    // cost, not the serve cost under comparison).
    val idxPath = idxTmp.resolve("idx").toString
    var built: DataFrame = null
    timed(s"index build (cells=$cells), cached") {
      built = Similarity.ivfPqIndex(e, numCells = cells).cache()
      built.count()
    }
    val partPath = idxPath + "_part"
    val wPart = timed("layout write: partitionBy(part, c)") {
      built.write.mode("overwrite").partitionBy("part", "c")
        .parquet(partPath); 0L
    }
    val wBuck = timed(s"layout write: partitionBy(part) + bucketBy($buckets, c)") {
      built.write.mode("overwrite").partitionBy("part")
        .bucketBy(buckets, "c").sortBy("c").saveAsTable(tbl); 0L
    }
    built.unpersist()
    val cellDirs = new java.io.File(s"$partPath/part=assign").list()
    println(s"[layout] partitioned layout: ${
      Option(cellDirs).map(_.length).getOrElse(0)} c= dirs under " +
      s"part=assign; bucketed: $buckets files per part dir")

    // serve arms: the q326/q476 registered shape at this corpus
    def ixPart: DataFrame = spark.read.parquet(partPath)
      .select(col("part"), col("id"), col("s"),
        col("c").cast("long").as("c"), col("vec"))
    def ixBuck: DataFrame = spark.table(tbl)
      .select(col("part"), col("id"), col("s"), col("c"), col("vec"))
    val queries = e.filter(col("vec_id") < 20)
    def servePart(): Long =
      Similarity.ivfPqServe(ixPart, e, queries, 3).count()
    def serveBuck(): Long =
      Similarity.ivfPqServe(ixBuck, e, queries, 3,
        bucketedIndex = true).count()

    // interchangeability: identical rows from both layouts (sorted
    // collect — the serve output is 20 queries × top-3, tiny)
    val rp = Similarity.ivfPqServe(ixPart, e, queries, 3)
      .collect().map(_.toString).sorted
    val rb = Similarity.ivfPqServe(ixBuck, e, queries, 3,
        bucketedIndex = true).collect().map(_.toString).sorted
    require(rp.sameElements(rb),
      s"layouts disagree: ${rp.length} vs ${rb.length} rows")
    println(s"[layout] serve outputs IDENTICAL across layouts " +
      s"(${rp.length} rows)")
    spark.catalog.clearCache()

    // interleaved min-of-N: pass i runs part then bucketed, so
    // neither arm systematically rides a warmer page cache
    val mins = (1 to passes).foldLeft((Double.MaxValue, Double.MaxValue)) {
      case ((bp, bb), i) =>
        val p = timed(s"serve partitioned p$i")(servePart())
        val b = timed(s"serve bucketed    p$i")(serveBuck())
        (math.min(bp, p), math.min(bb, b))
    }
    println(f"[layout] MIN serve partitioned: ${mins._1}%.2f s; " +
      f"bucketed: ${mins._2}%.2f s; bucketed/partitioned = ${
        mins._2 / mins._1}%.2f " +
      f"(n=$n, cells=$cells, buckets=$buckets, " +
      f"write part ${wPart}%.1f s vs buck ${wBuck}%.1f s)")
    } finally {
      // cleanup must run even when the interchangeability require()
      // throws (ADVICE r12): the temp table, both temp dirs, and the
      // session itself
      try spark.sql(s"DROP TABLE IF EXISTS $tbl")
      catch { case _: Throwable => () }
      try spark.stop() catch { case _: Throwable => () }
      rmTree(idxTmp)
      rmTree(wh)
    }
  }
}
