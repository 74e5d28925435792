package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the write-side
  * operator a 100 TB corpus needs once queries filter on more than
  * one column. Sorting files by a single column prunes that column
  * only; interleaving the bits of several columns' normalized values
  * (a Z-order / Morton curve) gives a total order in which rows close
  * in EVERY dimension land in the same files, so min/max footer stats
  * (or a partition column derived from the curve) prune scans on any
  * filtered subset of the dimensions at once. This is the same layout
  * step Delta/Iceberg `OPTIMIZE ZORDER BY` runs; here it is a plain
  * Column expression usable with `sortWithinPartitions` /
  * `repartitionByRange` before any parquet write.
  *
  * Scale shape: one min/max stats aggregation over the dimension
  * columns (map-side combinable, broadcast back — the same one-pass
  * statistics pattern as [[Outliers]] and q52's cell sizing), then
  * the z-value itself is a pure scan-speed projection: bucket =
  * linear min/max normalization to `bits` bits, interleave unrolled
  * at plan time into shift/mask arithmetic inside whole-stage
  * codegen. No shuffle, no window, no UDF; the optional final
  * `repartitionByRange(zval)` is the ONE range shuffle any global
  * layout pays by definition.
  *
  * Determinism/portability: normalization is equal-width binning
  * `least(floor((x - min) / (max - min) * 2^bits), 2^bits - 1)` in
  * double precision — IEEE-deterministic and replayed verbatim by the
  * SQL oracle (explicit `floor`, never an engine-dependent
  * cast-round; the multiply-by-2^bits-and-clamp form, NOT
  * `* (2^bits - 1)`, because the latter turns exact lattice points
  * into 1.9999... wobble — `2.0/3*3 < 2` in IEEE — while this form
  * is exact whenever the range is a power of two; constant columns
  * degenerate to bucket 0 via the max>min guard). Bits interleave
  * little-endian: dimension d contributes its bit i at output
  * position `i * nDims + d`, so with 2 dims × 16 bits the z-value
  * spans 32 bits — far inside the 63-bit signed-shift budget every
  * engine here honors.
  */
object Layout {

  /** Z-value column: `floor`-normalized `bits`-bit buckets per
    * dimension, bit-interleaved. `mins(d)`/`maxs(d)` are the
    * dimension's global min/max (from [[stats]] or known bounds). */
  def zValue(dims: Seq[Column], mins: Seq[Column], maxs: Seq[Column],
             bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits must fit a positive long")
    require(mins.size == dims.size && maxs.size == dims.size)
    val width = 1L << bits
    val buckets = dims.zipWithIndex.map { case (x, d) =>
      // max > min guard: a constant dimension contributes bucket 0
      // everywhere instead of a 0/0 NaN
      when(maxs(d) > mins(d),
        least(floor((x.cast("double") - mins(d).cast("double")) /
            (maxs(d).cast("double") - mins(d).cast("double")) *
            lit(width.toDouble)).cast("long"),
          lit(width - 1)))
        .otherwise(lit(0L))
    }
    val n = dims.size
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, d) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + d)
      }
    }.reduce(_ + _)
  }

  /** One-pass global min/max per dimension, broadcast as a 1-row
    * relation (columns `_min0`, `_max0`, `_min1`, ...). */
  def stats(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = dims.zipWithIndex.flatMap { case (c, d) =>
      Seq(min(col(c)).cast("double").as(s"_min$d"),
        max(col(c)).cast("double").as(s"_max$d"))
    }
    broadcast(df.agg(aggs.head, aggs.tail: _*))
  }

  /** The full operator: append a `zval` column computed against the
    * corpus's own min/max (one stats pass + scan-speed projection).
    * Write-side callers follow with
    * `repartitionByRange(n, col("zval")).sortWithinPartitions("zval")`
    * — file-count-many ranges of a curve that keeps every dimension's
    * neighborhoods co-located. */
  def withZValue(df: DataFrame, dims: Seq[String],
                 bits: Int = 16): DataFrame = {
    val st = stats(df, dims)
    df.crossJoin(st)
      .withColumn("zval", zValue(
        dims.map(col),
        dims.indices.map(d => col(s"_min$d")),
        dims.indices.map(d => col(s"_max$d")), bits))
      .drop(dims.indices.flatMap(d => Seq(s"_min$d", s"_max$d")): _*)
  }

  /** Storage-tiering plan: bucket keys (partitions, users, tables —
    * whatever the storage unit is) into hot/warm/cold by RECENCY of
    * last access relative to the newest access in the log, and
    * report per tier: key count, total bytes, byte share — the
    * evidence behind "move everything cold to infrequent-access and
    * save X%". Boundaries are day-granular and integer-exact; the
    * newest day is taken from the LOG (not wall clock), so the plan
    * is a pure function of the data.
    *
    * Scale shape: one map-side per-key agg, a 1-row max-day
    * broadcast, and a tiers-sized rollup. */
  def storageTiering(df: DataFrame, keyCol: String, dayCol: Column,
                     bytesCol: Column, hotDays: Long = 7L,
                     warmDays: Long = 30L): DataFrame = {
    require(hotDays >= 1 && warmDays > hotDays)
    val perKey = df.filter(col(keyCol).isNotNull && dayCol.isNotNull)
      .groupBy(col(keyCol))
      .agg(max(dayCol.cast("long")).as("_last"),
        sum(bytesCol.cast("long")).as("_bytes"))
    val newest = broadcast(perKey.agg(max("_last").as("_max")))
    val tiered = perKey.crossJoin(newest)
      .withColumn("tier",
        when(col("_max") - col("_last") <= hotDays, "hot")
          .when(col("_max") - col("_last") <= warmDays, "warm")
          .otherwise("cold"))
    val tot = broadcast(tiered.agg(sum("_bytes").as("_tb")))
    tiered.groupBy("tier")
      .agg(count(lit(1)).as("n_keys"), sum("_bytes").as("total_bytes"))
      .crossJoin(tot)
      .select(col("tier"), col("n_keys"), col("total_bytes"),
        round(col("total_bytes").cast("double") / col("_tb"), 6)
          .as("byte_share"))
  }

  /** Zone-map audit: per partition, the (min, max, nulls) footer
    * stats a columnar layout keeps, plus whether a `[lo, hi]` range
    * predicate could PRUNE the partition without reading it — and
    * the resulting scan fraction. This measures what the layout work
    * ([[withZValue]], partitioning keys) actually buys: a predicate
    * whose zone maps prune nothing means the sort key is wrong for
    * that query, no matter how elegant the curve. All-null
    * partitions prune (a range predicate rejects NULL; a
    * null-accepting predicate is a different audit).
    *
    * Scale shape: exactly the footer-stats pass a writer already
    * does — one map-side-combinable agg per partition; the scan
    * fraction is a window over the BOUNDED partition relation. */
  def zoneMapPruning(df: DataFrame, partCol: Column, valueCol: Column,
                     lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lo <= hi)
    val w = Window.partitionBy(lit(1))
    df.groupBy(partCol.as("part"))
      .agg(count(lit(1)).as("n_rows"),
        min(valueCol.cast("long")).as("vmin"),
        max(valueCol.cast("long")).as("vmax"),
        sum(when(valueCol.isNull, 1L).otherwise(0L)).as("n_nulls"))
      .withColumn("prunable",
        col("vmin").isNull || col("vmax") < lo || col("vmin") > hi)
      .withColumn("scan_fraction", round(
        sum(when(col("prunable"), 0L).otherwise(col("n_rows"))).over(w)
          .cast("double") / sum("n_rows").over(w), 6))
  }

  /** Small-file compaction plan: within each partition, files under
    * `smallThreshold` are packed into rewrite bins of ~`targetBytes`
    * by the sequential-fill rule — files ordered (size DESC, id) and
    * cut wherever the running size-before crosses a target multiple:
    * bin = Σ_before div target. One window pass, linear, and
    * deterministic on any engine (the classic first-fit-decreasing
    * needs per-bin residual state — a sequential fold no shuffle
    * plan expresses; sequential fill overshoots each bin by at most
    * one file, which a rewrite job absorbs). Files at or above the
    * threshold are already compact and excluded. Returns one row per
    * (partition, bin): file count, total bytes, and the id list as a
    * sorted CSV string (arrays don't hash in the harness compare).
    *
    * Scale shape: the plan costs one pass over the MANIFEST — a
    * metadata relation orders of magnitude smaller than the data —
    * with one partition-keyed shuffle and a per-partition sort. The
    * rewrite jobs it emits are the expensive part, and they are
    * exactly the (partition, bin) groups, each independently
    * executable. A 100 TB lake's manifest is ~10⁷ files: one
    * executor-sized window partition per table partition. */
  def compactionPlan(manifest: DataFrame, partCol: Column, fileCol: Column,
                     sizeCol: Column, targetBytes: Long,
                     smallThreshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetBytes >= smallThreshold && smallThreshold > 0)
    val files = manifest
      .filter(partCol.isNotNull && fileCol.isNotNull && sizeCol.isNotNull)
      .select(partCol.as("_p"), fileCol.cast("long").as("_f"),
        sizeCol.cast("long").as("_sz"))
      .filter(col("_sz") < smallThreshold && col("_sz") >= 0L)
    val before = Window.partitionBy("_p")
      .orderBy(col("_sz").desc, col("_f"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_bef", coalesce(sum("_sz").over(before), lit(0L)))
      // int64 `div`, never FP: byte offsets exceed 2^53 at lake scale
      .withColumn("bin", expr(s"_bef div ${targetBytes}L"))
      .groupBy(col("_p").as("partition"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum("_sz").as("total_bytes"),
        array_join(transform(sort_array(collect_list(col("_f"))),
          f => f.cast("string")), ",").as("files"))
  }

  /** Per-(partition, bucket) file counts of a bucketed catalog table,
    * read from the table directory itself — the manifest the
    * maintenance loop watches (every bucketed `insertInto` append
    * adds ≥1 file per populated bucket per write task, so file counts
    * grow linearly with append waves and the sorted-bucket read
    * degrades: more footers per task, and the per-file sort order no
    * longer spans the bucket). Bucket ids come from Spark's bucketed
    * file naming (`..._NNNNN.c000...`). Returns (partitionValue,
    * bucketId, nFiles, bytes) rows as a local Seq: this is METADATA —
    * one filesystem listing, proportional to file count, never data —
    * the same driver-side grain `DESCRIBE` itself reads. A 100 TB
    * lake reads the same facts from its catalog/manifest table and
    * feeds them to [[compactionPlan]]; the listing here is the
    * local-filesystem stand-in for that metadata service. */
  def bucketFileManifest(spark: org.apache.spark.sql.SparkSession,
                         table: String): Seq[(String, Int, Int, Long)] = {
    val loc = spark.sql(s"DESCRIBE FORMATTED $table").collect()
      .find(r => Option(r.getString(0)).exists(_.trim == "Location"))
      .map(_.getString(1))
      .getOrElse(sys.error(s"no Location for table $table"))
    val root = new java.io.File(new java.net.URI(loc))
    val bucketRe = "_(\\d{5})(?:[._-]|$)".r
    val partDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.contains("="))
    partDirs.toSeq.flatMap { d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .flatMap { f =>
          bucketRe.findFirstMatchIn(
            f.getName.stripSuffix(".snappy.parquet").stripSuffix(".parquet"))
            .map(m => (d.getName, m.group(1).toInt, f.length()))
        }
        .groupBy { case (p, b, _) => (p, b) }
        .map { case ((p, b), fs) => (p, b, fs.length, fs.map(_._3).sum) }
        .toSeq.sortBy(t => (t._1, t._2))
    }
  }

  /** Bucket-preserving compaction of a partitioned + bucketed catalog
    * table — the maintenance pass that closes the standing-index
    * append loop (q479 proves ONE wave appends cleanly; production is
    * thousands of waves, and without this pass files-per-bucket grows
    * linearly forever). Partitions where any bucket holds more than
    * `maxFilesPerBucket` files are rewritten IN PLACE:
    *
    *   - the rewrite is partition-selective (dynamic partition
    *     overwrite via `insertInto` — untouched partitions keep their
    *     files, byte-identical), the property that makes the pass
    *     incremental at lake scale where only recent partitions
    *     accrete;
    *   - rows are first clustered to one task per bucket id
    *     (`repartition(numBuckets, bucketCol)` — `repartition`'s
    *     HashPartitioning and the bucket-file assignment share the
    *     same murmur3 `pmod(hash(c), n)`, so task i holds exactly
    *     bucket i's rows) — the rewrite lands ONE file per populated
    *     (partition, bucket), the compact steady state;
    *   - `insertInto` honors the table's bucket spec and sort spec on
    *     the new files (Spark refuses anything else), so the
    *     Exchange-free serve survives the compaction — pinned by
    *     PlanShapeSpec's q480 walk, the one property neither row
    *     counts nor the DuckDB oracle can see;
    *   - the snapshot is materialized (`localCheckpoint`) before the
    *     overwrite so the job never reads the files it is deleting
    *     (and passes Spark's self-overwrite analysis check). At lake
    *     scale the same two-step is a staging write + partition swap.
    *
    * Returns the rewritten partition values (empty = nothing exceeded
    * the threshold — the pass is idempotent and cheap to run often).
    * Compaction changes ZERO rows: q480 registers append→compact→
    * serve against the SAME replay oracle as the uncompacted q479
    * path, so row preservation is oracle-enforced, not assumed.
    *
    * `maxFilesPerBucket` defaults to 16, the ECONOMIC trigger: the
    * measured accretion curve (SCALING.md r13 — serve tax ~1.17× at
    * +20 files/bucket, compaction 2.6–3.6 s) prices the cure as cheap
    * insurance around 16–32 files/bucket; compacting every wave would
    * pay a full partition rewrite for noise-level serve decay. Pass 1
    * to force the one-file-per-bucket steady state (what the q480
    * demo and the specs assert).
    *
    * The passed (numBuckets, bucketCol) are validated against the
    * table's CATALOG bucket spec when DESCRIBE exposes it: a
    * numBuckets above the table's real count would split each bucket
    * across several rewrite tasks, landing >1 file per bucket — the
    * pass would then report partitions rewritten while never reaching
    * its steady state, re-rewriting them forever (ADVICE r13). */
  /** Hive path-name unescape: partition VALUES are %XX-escaped in
    * directory names (space → %20, ':' → %3A, …); matching rows by
    * the raw directory string would silently select nothing. */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append((Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Hive's directory name for a NULL partition value. */
  private val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  def compactBucketedTable(spark: org.apache.spark.sql.SparkSession,
                           table: String, partCol: String,
                           bucketCol: String, numBuckets: Int,
                           maxFilesPerBucket: Int): Seq[String] =
    compactBucketedTable(spark, table, partCol, Seq(bucketCol),
      numBuckets, maxFilesPerBucket)

  def compactBucketedTable(spark: org.apache.spark.sql.SparkSession,
                           table: String, partCol: String,
                           bucketCol: String, numBuckets: Int): Seq[String] =
    compactBucketedTable(spark, table, partCol, Seq(bucketCol), numBuckets, 16)

  /** Multi-column bucket-spec form (the band index buckets by
    * (band, sig) — Spark's co-partitioning check,
    * `spark.sql.requireAllClusterKeysForCoPartition` = true by
    * default, demands the bucket spec equal the probe join's keys
    * EXACTLY, so a compound key must be bucketed compoundly;
    * `repartition(n, cols...)`'s HashPartitioning and the bucket-file
    * assignment share the same multi-column murmur3 fold, so the
    * one-file-per-bucket steady state holds unchanged). */
  def compactBucketedTable(spark: org.apache.spark.sql.SparkSession,
                           table: String, partCol: String,
                           bucketCols: Seq[String], numBuckets: Int,
                           maxFilesPerBucket: Int = 16): Seq[String] = {
    spark.sparkContext.setJobDescription(s"compactBucketedTable $table")
    try compactBucketedTable0(spark, table, partCol, bucketCols,
      numBuckets, maxFilesPerBucket)
    finally spark.sparkContext.setJobDescription(null)
  }

  private def compactBucketedTable0(spark: org.apache.spark.sql.SparkSession,
                           table: String, partCol: String,
                           bucketCols: Seq[String], numBuckets: Int,
                           maxFilesPerBucket: Int): Seq[String] = {
    require(maxFilesPerBucket >= 1, s"maxFilesPerBucket $maxFilesPerBucket")
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    // validate against the catalog's own bucket spec where DESCRIBE
    // exposes it — a mismatched numBuckets mis-clusters the rewrite
    // (see scaladoc), mismatched columns would shuffle rows into the
    // WRONG buckets entirely
    val desc = spark.sql(s"DESCRIBE FORMATTED $table").collect()
    def descVal(key: String): Option[String] = desc
      .find(r => Option(r.getString(0)).exists(_.trim == key))
      .map(r => Option(r.getString(1)).getOrElse("").trim)
    descVal("Num Buckets").flatMap(_.toIntOption).foreach { nb =>
      require(nb == numBuckets,
        s"$table is bucketed into $nb buckets, caller passed $numBuckets") }
    descVal("Bucket Columns").foreach { bc =>
      val cols = bc.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
      require(cols == bucketCols,
        s"$table is bucketed by ${cols.mkString(",")}, caller passed " +
          bucketCols.mkString(",")) }
    val manifest = bucketFileManifest(spark, table)
    // an empty manifest on a known-bucketed table means the Location
    // row or Spark's bucket-file naming drifted — fail LOUD instead of
    // silently no-opping while accretion continues unbounded
    require(manifest.nonEmpty,
      s"$table's bucket-file manifest is empty - table location moved " +
        "or bucket-file naming drifted; compaction would silently no-op")
    val prefix = partCol + "="
    // directory names carry ESCAPED partition values (and the Hive
    // null sentinel): unescape before row-matching, or a value like
    // "a b" (dir "a%20b") would match zero rows while still being
    // reported rewritten — a silent no-op that repeats forever
    val needy = manifest
      .filter { case (p, _, n, _) =>
        p.startsWith(prefix) && n > maxFilesPerBucket }
      .map(t => unescapePathName(t._1.stripPrefix(prefix)))
      .distinct.sorted
    if (needy.nonEmpty) {
      val (nullParts, vals) = needy.partition(_ == NullPartition)
      val before =
        spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        val pred =
          if (nullParts.isEmpty) col(partCol).isin(vals: _*)
          else if (vals.isEmpty) col(partCol).isNull
          else col(partCol).isin(vals: _*) || col(partCol).isNull
        val snap = spark.table(table).filter(pred).localCheckpoint()
        snap.repartition(numBuckets, bucketCols.map(col): _*)
          .write.mode("overwrite").insertInto(table)
      } finally before.fold(
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
    }
    needy
  }

  /** Metadata-level CLONE of a partitioned+bucketed catalog table —
    * `CREATE TABLE` from the source's own DDL + a raw file copy +
    * `MSCK REPAIR` to register the partitions. Replaces the
    * scan→sort→bucketed-write CTAS the standing-index demos (q479–
    * q482) ran per pass purely for rerun safety: the clone is
    * byte-identical by construction (bucket ids live in the copied
    * FILE NAMES, so the bucket spec — and the Exchange-free serve —
    * survives exactly; PlanShapeSpec's q480/q482 walks still pin it),
    * and costs one directory copy + two DDLs instead of a Spark write
    * job (r14: ~0.4–0.8 s per maintenance query). This is what a lake
    * does when it snapshots a table (metadata/file operation, not a
    * recompute); the SOURCE table's own build is untouched and still
    * computed from the parquet inputs. */
  def cloneBucketedTable(spark: org.apache.spark.sql.SparkSession,
                         src: String, dst: String): Unit = {
    spark.sparkContext.setJobDescription(s"cloneBucketedTable $src -> $dst")
    try cloneBucketedTable0(spark, src, dst)
    finally spark.sparkContext.setJobDescription(null)
  }

  private def cloneBucketedTable0(spark: org.apache.spark.sql.SparkSession,
                                  src: String, dst: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $dst")
    val ddl = spark.sql(s"SHOW CREATE TABLE $src").collect()(0).getString(0)
      // strip an explicit LOCATION clause if present — the clone must
      // land in ITS OWN managed directory, never the source's
      .replaceAll("(?i)LOCATION\\s+'[^']*'", "")
      // the hashed table names are globally unique strings, so a
      // plain replace renames every qualified form at once
      .replace(src, dst)
    // the blind replace is only safe while the uniqueness assumption
    // holds — assert it (ADVICE r14): exactly one identifier equal to
    // dst must appear, and none equal to src may survive
    require(!ddl.contains(src) && ddl.contains(dst),
      s"cloneBucketedTable: DDL rewrite $src -> $dst corrupted the " +
        "statement (source name is a substring of another identifier?)")
    spark.sql(ddl)
    def loc(t: String): java.nio.file.Path = {
      val l = spark.sql(s"DESCRIBE FORMATTED $t").collect()
        .find(r => Option(r.getString(0)).exists(_.trim == "Location"))
        .map(_.getString(1)).getOrElse(sys.error(s"no Location for $t"))
      java.nio.file.Paths.get(new java.net.URI(l))
    }
    val (srcRoot, dstRoot) = (loc(src), loc(dst))
    java.nio.file.Files.createDirectories(dstRoot)
    val s0 = java.nio.file.Files.walk(srcRoot)
    try s0.forEach { p =>
      val rel = srcRoot.relativize(p)
      val name = p.getFileName.toString
      val tgt = dstRoot.resolve(rel.toString)
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.createDirectories(tgt)
      } else if (!name.startsWith("_") && !name.startsWith(".")) {
        java.nio.file.Files.copy(p, tgt,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally s0.close()
    // register the copied partitions DIRECTLY from the source's
    // catalog metadata (one ALTER ... ADD PARTITION statement), not
    // MSCK REPAIR: repair re-walks the whole table directory to
    // DISCOVER partitions we already know by name — at a real table's
    // partition count that is the expensive full-listing path
    // (VERDICT r14 item 3; guide §6 file-listing). Partition dir
    // names are Hive-escaped exactly as the source's, so the default
    // partition locations land on the copied directories verbatim.
    val parts = spark.sql(s"SHOW PARTITIONS $src").collect()
      .map(_.getString(0))
    if (parts.exists(_.split("/").exists(_.endsWith("=" + NullPartition)))) {
      // a NULL partition value has no ADD PARTITION literal — fall
      // back to discovery for that rare shape
      spark.sql(s"MSCK REPAIR TABLE $dst")
    } else if (parts.nonEmpty) {
      val specs = parts.map { p =>
        p.split("/").map { kv =>
          val Array(k, v) = kv.split("=", 2)
          s"$k='${unescapePathName(v).replace("'", "\\'")}'"
        }.mkString("PARTITION (", ", ", ")")
      }
      spark.sql(s"ALTER TABLE $dst ADD IF NOT EXISTS ${specs.mkString(" ")}")
    }
  }
}
