package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** Structured Streaming flavor of the reference's semantics
  * (SURVEY.md §2.10): the scheduled 30-minute-lookback batch becomes
  * a watermarked stream, and per-run latest-per-device dedup becomes
  * keyed state that survives across triggers.
  *
  * | reference (task.ts)          | here                            |
  * |------------------------------|---------------------------------|
  * | scheduled Lambda run         | trigger (AvailableNow/interval) |
  * | 30-min lookback re-delivery  | watermark absorbs re-delivery   |
  * | per-run Map latest-per-IMEI  | [[latestPerKey]] keyed state    |
  * | per-window batch counts      | [[windowedAgg]] event-time agg  |
  *
  * Scale: state is per-key-partitioned by the shuffle on `groupByKey`;
  * RocksDB state store + watermark-driven eviction keep executors
  * bounded no matter the key cardinality.
  */
object StreamingOps {

  /** Production state-store configuration: the RocksDB provider
    * (bundled with Spark) keeps keyed state OFF-HEAP and spillable,
    * so executor memory bounds are governed by the block cache, not
    * the key cardinality — the difference between "state fits until
    * it doesn't" (default HDFS-backed in-memory maps) and a bounded
    * footprint at 100 TB/day ingest. Changelog checkpointing ships
    * per-trigger deltas instead of full snapshots. Set these on the
    * session (or cluster conf) BEFORE starting streaming queries;
    * StreamingOpsSpec runs the operators under this provider to pin
    * that the plans are provider-agnostic. */
  val rocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Cross-trigger latest-per-key state (the `mapGroupsWithState`
    * flavor of D1, reference `task.ts:151-159`): each trigger emits,
    * per key seen in the batch, the latest record across *all*
    * triggers so far. Use OutputMode.Update. */
  def latestPerKey[K: Encoder, T: Encoder](
      ds: Dataset[T], key: T => K, ts: T => Long): Dataset[T] =
    ds.groupByKey(key)
      .mapGroupsWithState[T, T](GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          val latest = (state.getOption.iterator ++ rows).maxBy(ts)
          state.update(latest)
          latest
      }

  /** [[latestPerKey]] with bounded state: event-time TTL eviction via
    * `flatMapGroupsWithState` + `EventTimeTimeout`. A device that
    * stops reporting is evicted once the watermark passes its last
    * event + `ttlMs`, emitting a final `(record, expired = true)`
    * tombstone — so downstream can distinguish "latest position"
    * updates from "track ended" closures, and executor state stays
    * bounded by the *active* key set, not the all-time key set.
    * Input must carry an event-time column with a watermark
    * (`withWatermark`) for the timeout clock to advance. */
  def latestPerKeyExpiring[K: Encoder, T: Encoder](
      ds: Dataset[T], key: T => K, ts: T => Long, ttlMs: Long): Dataset[(T, Boolean)] = {
    implicit val outEnc: Encoder[(T, Boolean)] =
      org.apache.spark.sql.Encoders.tuple(implicitly[Encoder[T]],
        org.apache.spark.sql.Encoders.scalaBoolean)
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, (T, Boolean)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator((last, true))
          } else {
            val latest = (state.getOption.iterator ++ rows).maxBy(ts)
            state.update(latest)
            state.setTimeoutTimestamp(ts(latest) + ttlMs)
            Iterator((latest, false))
          }
      }
  }

  /** Event-time tumbling-window aggregation with lateness bound —
    * the declarative analog of the reference's lookback window
    * (`task.ts:80-82` → watermark; SURVEY.md §2.10 table). */
  def windowedAgg(df: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String = "30 minutes",
                  lateness: String = "30 minutes",
                  valueCol: String = "value"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Streaming exact dedup with bounded state: drop duplicate keys
    * arriving within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — the streaming analog of the
    * q07 exact-dedup operator for a continuously-ingesting document
    * pipeline (dedup key = content fingerprint). Unlike plain
    * `dropDuplicates`, state for a key is evicted once the watermark
    * passes it, so executors hold only the recent-horizon key set —
    * the property that makes streaming ingest dedup viable at
    * 100 TB/day. */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  lateness: String = "30 minutes"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Event-time session windows (gap-based), the streaming analog of
    * the q34 batch sessionization: a session closes when no event
    * arrives for `gap`, and is emitted once the watermark passes its
    * end. State per key is one open session, merged incrementally —
    * never the event backlog. */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String = "30 minutes",
                 lateness: String = "30 minutes",
                 valueCol: String = "value"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Stream-stream interval join — the streaming analog of the batch
    * band join (q62/q68): every left event joined to right events of
    * the same key whose time falls in
    * `[leftTs − window, leftTs]` (attribution semantics). Both sides
    * carry watermarks, which is what BOUNDS the join state: Spark
    * derives from watermark + time condition how long a buffered row
    * can still match and evicts it after — without the interval
    * condition, stream-stream join state grows forever. Column names
    * must be distinct across the two sides (rename before calling).
    * Inner append-mode join: matches emit as soon as both sides
    * arrive. `joinType = "left_outer"` additionally emits NULL-padded
    * left rows, but only once the WATERMARK proves no match can still
    * arrive — state that is live when the query stops is NOT flushed,
    * so a bounded replay must push the watermark past the data (a
    * later-batch sentinel row, q123's two-run pattern) to see every
    * unmatched row. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         window: String = "30 minutes",
                         lateness: String = "30 minutes",
                         joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(right.withWatermark(rightTs, lateness),
        expr(s"$leftKey = $rightKey AND " +
          s"$rightTs >= $leftTs - INTERVAL $window AND $rightTs <= $leftTs"),
        joinType)

  /** Windowed distinct-count estimation on a stream via the HLL
    * aggregate ([[graft.plans.HllAgg]]): registers are max-mergeable,
    * so they fold incrementally across triggers in the state store —
    * fixed 256-byte state per (window, key) no matter how many
    * distinct values flow through. Exact windowed COUNT(DISTINCT)
    * would require unbounded per-window value state; this is the
    * sketch-for-state trade that makes it viable on an unbounded
    * stream, and the estimate is identical to the batch
    * [[graft.operators.Sketches.hllDistinct]] over the same rows. */
  def windowedDistinct(df: DataFrame, tsCol: String, keyCol: String,
                       valueCol: String,
                       windowLen: String = "30 minutes",
                       lateness: String = "30 minutes"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(round(graft.operators.Sketches.hllAggCol(col(valueCol)), 4)
        .as("est_distinct"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("est_distinct"))

  /** Incremental SCD-1: apply a STREAM of CDC changes to a dimension
    * table, one [[graft.operators.Merge.scd1]] per micro-batch — the
    * "MERGE INTO from a stream" pattern (what a Delta/Iceberg sink
    * does) on plain parquet via foreachBatch + ping-pong state paths
    * (each batch reads generation g and writes g+1; never overwrites
    * the files it is reading).
    *
    * Contract: per-key version monotonicity ACROSS batches (the
    * standard keyed-topic CDC guarantee) — each batch's latest change
    * is applied unconditionally, exactly like running scd1 on the
    * batches in sequence. Within a batch, `versionCols` order changes
    * as usual. Sequential apply equals one batch scd1 over the
    * concatenated log (spec-pinned) EXCEPT for delete-then-reinsert
    * sequences spanning batches: here the re-insert creates a fresh
    * row with NULL base-only attributes (the row was genuinely
    * deleted — faithful CDC semantics), whereas a one-shot merge
    * would let the later change supersede the delete and keep them
    * (q98's staged oracle pins the incremental behavior).
    *
    * Scale shape: each micro-batch is ONE max_by reduction of the
    * batch (small) + ONE key-equi full-outer join against the current
    * table — the incremental cost a real MERGE pays; with a bucketed
    * state layout the join is co-located. Returns a handle whose
    * `current()` reads the latest generation. */
  final class Scd1Handle(spark: org.apache.spark.sql.SparkSession,
                         dir: String,
                         gen: java.util.concurrent.atomic.AtomicLong) {
    def currentPath: String = s"$dir/gen-${gen.get}"
    def current(): DataFrame = spark.read.parquet(currentPath)
  }

  /** RESTART-SAFE generation seeding shared by the incremental-table
    * streams ([[scd1Stream]], [[sessionMergeStream]]): resume from the
    * highest COMPLETE generation on disk — re-seeding from scratch
    * after a checkpointed restart would silently drop every
    * previously merged batch (the stream's checkpoint skips them, so
    * they would never be re-applied). Only generations with a
    * _SUCCESS marker count: a crash mid-write leaves a partial gen-N
    * (the committer writes the marker last), and seeding from it
    * would replay the checkpointed batch onto a corrupt base — silent
    * data loss on exactly the restart path this exists for. Dangling
    * partials are deleted so the re-run's overwrite starts clean. All
    * state IO goes through the Hadoop FS of the stateDir, so HDFS/S3
    * state dirs work (java.io.File would silently no-op the GC). */
  private def seedGenerations(spark: org.apache.spark.sql.SparkSession,
                              stateDir: String, seed: => DataFrame)
      : (org.apache.hadoop.fs.FileSystem, java.util.concurrent.atomic.AtomicLong) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(hconf)
    val existing =
      if (fs.exists(root)) {
        val all = fs.listStatus(root).map(_.getPath.getName)
          .collect { case n if n.startsWith("gen-") => n.drop(4).toLong }
        val (complete, partial) = all.partition(g => fs.exists(
          new org.apache.hadoop.fs.Path(s"$stateDir/gen-$g/_SUCCESS")))
        partial.foreach(g => fs.delete(
          new org.apache.hadoop.fs.Path(s"$stateDir/gen-$g"), true))
        complete
      } else Array.empty[Long]
    val gen = new java.util.concurrent.atomic.AtomicLong(
      if (existing.isEmpty) 0L else existing.max)
    if (existing.isEmpty)
      seed.write.mode("overwrite").parquet(s"$stateDir/gen-0")
    (fs, gen)
  }

  def scd1Stream(changes: DataFrame, base: DataFrame, key: String,
                 versionCols: Seq[String],
                 deleteWhen: org.apache.spark.sql.Column,
                 updates: Seq[(String, String)],
                 stateDir: String): (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], Scd1Handle) = {
    val spark = base.sparkSession
    val (fs, gen) = seedGenerations(spark, stateDir, base)
    val handle = new Scd1Handle(spark, stateDir, gen)
    val writer = changes.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        val g = gen.get
        val curr = spark.read.parquet(s"$stateDir/gen-$g")
        graft.operators.Merge.scd1(curr, batch, key, versionCols,
            deleteWhen, updates)
          .write.mode("overwrite").parquet(s"$stateDir/gen-${g + 1}")
        gen.incrementAndGet()
        // generation GC: g+1 is durable, g stays as the rollback copy,
        // anything older is dead weight (a long stream would otherwise
        // accumulate one table copy per micro-batch)
        if (g >= 1)
          fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/gen-${g - 1}"), true)
        ()
    }
    (writer, handle)
  }

  /** Streaming INCREMENTAL sessionization: maintain a persistent
    * session table (key, s, e, w) — interval [sess_start,
    * max_ts + gap] plus member count — by re-merging each
    * micro-batch's events into it via the weighted gaps-and-islands
    * merge. Interval union is associative, so after any number of
    * micro-batches in any slicing the table EQUALS one-shot
    * sessionization of all events seen (q171's law, applied
    * incrementally; q178 hash-checks it end-to-end). Late events are
    * handled for free: an event landing inside or near an old session
    * simply merges into it — no watermark cliff, unlike the native
    * session-window aggregation ([[sessionAggStream]]) which must
    * eventually seal state. The trade: per-batch cost is a full
    * state-table rewrite, the classic compact-table maintenance shape
    * (same class as [[scd1Stream]]); generations + _SUCCESS gating
    * make restarts exactly-once.
    */
  def sessionMergeStream(events: DataFrame, keyCol: String,
                         tsUs: org.apache.spark.sql.Column, gapUs: Long,
                         stateDir: String): (org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row], Scd1Handle) = {
    val spark = events.sparkSession
    def toIntervals(df: DataFrame): DataFrame = df
      .select(col(keyCol), tsUs.cast("long").as("s"))
      .withColumn("e", col("s") + gapUs)
      .withColumn("w", lit(1L))
    val (fs, gen) = seedGenerations(spark, stateDir,
      toIntervals(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        events.schema)))
    val handle = new Scd1Handle(spark, stateDir, gen)
    val writer = events.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        val g = gen.get
        val curr = spark.read.parquet(s"$stateDir/gen-$g")
        graft.operators.TimeSeries.mergeIntervals(
            curr.unionByName(toIntervals(batch)),
            keyCol, "s", "e", Seq("e"), Some("w"))
          .select(col(keyCol), col("island_start").as("s"),
            col("island_end").as("e"), col("n_merged").as("w"))
          .write.mode("overwrite").parquet(s"$stateDir/gen-${g + 1}")
        gen.incrementAndGet()
        if (g >= 1)
          fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/gen-${g - 1}"), true)
        ()
    }
    (writer, handle)
  }

  /** Streaming EXACT per-window top-k dimension values — the
    * trending-now query (top event types per hour) as a genuine
    * streaming operator. The native route (windowed count + rank) is
    * unsupported in append mode (no window function over a streaming
    * aggregate), so this keys `flatMapGroupsWithState` by tumbling
    * window start: state is the window's dim→count map, folded
    * incrementally across micro-batches; when the WATERMARK passes
    * the window end the event-time timeout fires, the top-k rows
    * (count desc, dim asc tiebreak) emit exactly once, and the state
    * is freed. Output rows therefore appear only for CLOSED windows —
    * append-mode semantics with per-window finality.
    *
    * NULL dim values advance the event-time clock but are NEVER
    * counted: a null-dim row flows through the watermark node and
    * into its window's group (so the window exists and its timeout is
    * armed) yet contributes nothing to the top-k. That is the
    * watermark-only sentinel contract for bounded replays (q123's
    * flush trick) — a plain post-watermark `filter` does NOT work
    * here, because Catalyst pushes non-event-time predicates through
    * `EventTimeWatermark` into the scan and the sentinel row would
    * never reach the watermark operator at all.
    *
    * Scale: state per open window is one map bounded by the dim
    * cardinality (event types: tens), sharded across executors by the
    * window-key shuffle; total state = open windows × dims, bounded by
    * the watermark horizon regardless of stream length. For
    * high-cardinality dims swap the exact map for the Misra-Gries
    * summary ([[graft.plans.FreqAgg]]'s merge law) — same plan shape,
    * bounded error. The timeout is clamped above the current
    * watermark so a window straddling the lateness edge still flushes
    * (later, complete, once) instead of throwing. */
  def windowedTopK(df: DataFrame, tsCol: String, dimCol: String,
                   windowLenMs: Long, k: Int,
                   lateness: String = "0 seconds"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the watermarked event-time column must reach the stateful
    // operator (event-time timeout requires it in its child), so it
    // rides along unused
    val rows = df.withWatermark(tsCol, lateness)
      .select(
        (unix_millis(col(tsCol)) -
          pmod(unix_millis(col(tsCol)), lit(windowLenMs))).as("wstart"),
        col(dimCol).cast("string").as("dim"),
        col(tsCol).as("et"))
      .as[(Long, String, java.sql.Timestamp)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], (Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstart: Long, it: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            counts.toSeq.sortBy { case (d, n) => (-n, d) }.take(k)
              .zipWithIndex
              .map { case ((d, n), i) => (wstart, d, n, (i + 1).toLong) }
              .iterator
          } else {
            val m = scala.collection.mutable.Map.empty[String, Long]
            state.getOption.foreach(m ++= _)
            it.foreach(r =>
              if (r._2 != null) m.update(r._2, m.getOrElse(r._2, 0L) + 1L))
            state.update(m.toMap)
            state.setTimeoutTimestamp(math.max(wstart + windowLenMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }.toDF("window_start", "dim", "n", "rnk")
  }

  /** Streaming per-window histogram quantiles — the latency/price
    * percentile monitor as a genuine streaming operator, on
    * [[windowedTopK]]'s exact plan shape: state per open tumbling
    * window is a FIXED `bins`-counter vector (the additive
    * [[graft.operators.Sketches]] histogram — merge is vector add, so
    * folding micro-batches into state is the sketch's own merge law),
    * flushed exactly once by event-time timeout when the watermark
    * passes the window end. Emits one row per (closed window,
    * requested percent): the upper bound of the first bin whose
    * cumulative count reaches the percent — an integer, exact-
    * arithmetic estimate (bin-width resolution), deterministic on any
    * engine and replayable by a batch oracle.
    *
    * Bin bounds are FIXED parameters (lo, hi, bins), not data-derived
    * — the monitoring contract: the same bins forever, so windows
    * compare across time. Values below lo / above hi clamp to the
    * edge bins (the clamp happens AFTER the division, absorbing
    * floor-vs-truncate integer-division differences across engines).
    * NULL values ride the watermark uncounted ([[windowedTopK]]'s
    * sentinel contract).
    *
    * Scale: state = open windows × bins int64 counters, bounded by
    * the watermark horizon; value cardinality is irrelevant (unlike
    * the exact top-k map). */
  def windowedHistQuantiles(df: DataFrame, tsCol: String,
                            valueCol: String, windowLenMs: Long,
                            lo: Long, hi: Long, bins: Int,
                            percents: Seq[Int] = Seq(50, 90, 99),
                            lateness: String = "0 seconds"): DataFrame = {
    require(bins >= 1 && hi > lo && (hi - lo) % bins == 0 &&
      percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val w = (hi - lo) / bins
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.withWatermark(tsCol, lateness)
      .select(
        (unix_millis(col(tsCol)) -
          pmod(unix_millis(col(tsCol)), lit(windowLenMs))).as("wstart"),
        col(valueCol).cast("long").as("v"),
        col(tsCol).as("et"))
      .as[(Long, Option[Long], java.sql.Timestamp)]
    val ps = percents.toArray
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Long, Long, Int, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstart: Long, it: Iterator[(Long, Option[Long], java.sql.Timestamp)],
         state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val total = counts.sum
            if (total == 0L) Iterator.empty
            else ps.iterator.map { p =>
              var cum = 0L
              var idx = 0
              var hit = -1
              while (idx < bins && hit < 0) {
                cum += counts(idx)
                if (cum * 100 >= p.toLong * total) hit = idx
                idx += 1
              }
              (wstart, total, p, lo + (hit + 1) * w)
            }
          } else {
            val counts = state.getOption.getOrElse(new Array[Long](bins))
            it.foreach(_._2.foreach { v =>
              val b = math.min((bins - 1).toLong,
                math.max(0L, (v - lo) / w)).toInt
              counts(b) += 1L
            })
            state.update(counts)
            state.setTimeoutTimestamp(math.max(wstart + windowLenMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }.toDF("window_start", "n", "percent", "value")
  }

  /** Streaming Page–Hinkley drift alarm: the q371 batch fold as
    * CONTINUOUS keyed state — per key the running (n, Σx, m, min m)
    * quadruple folds each arriving bucket in event order, and a row
    * is emitted the moment the rounded PH statistic crosses `lambda`
    * (the monitoring read: "this series' mean has shifted", per key,
    * as it happens — the batch operator can only say so at the next
    * scheduled run). State is 4 scalars per key, forever-bounded;
    * NoTimeout (a drift monitor never forgets its baseline;
    * re-baselining is a state-version bump upstream).
    *
    * Determinism: the fold sorts each micro-batch's rows by the
    * BUCKET KEY t (the [[graft.operators.TimeSeries.pageHinkley]]
    * pre-aggregated-bucket contract — unique t per key), and the
    * running mean uses the exact integer (n, Σx) pair, so with an
    * AvailableNow replay the emitted rows equal the batch formula's
    * alarm rows exactly (the oracle). PH compares ROUNDED (6dp,
    * HALF_UP — Spark's `round`) against lambda, mirroring the batch
    * dual's `round(...) > lambda`.
    *
    * Scale shape: one shuffle on the key; per-trigger work is the
    * batch's bucket rows; emitted volume = alarm rows only. */
  def driftAlarmStream(df: DataFrame, keyCol: String, tCol: String,
                       valCol: String, lambda: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).cast("string").as("g"),
        col(tCol).cast("long").as("t"), col(valCol).cast("long").as("x"))
      .as[(String, Long, Long)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Double, Double),
        (String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long, Double, Double)]) =>
          var (n, s, m, minM) =
            state.getOption.getOrElse((0L, 0L, 0.0, 0.0))
          val out =
            scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
          it.toArray.sortBy(_._2).foreach { case (_, t, x) =>
            n += 1; s += x
            m += x.toDouble - s.toDouble / n
            if (m < minM) minM = m
            val ph = BigDecimal(m - minM)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (ph > lambda) out += ((g, t, ph))
          }
          state.update((n, s, m, minM))
          out.iterator
      }.toDF("key", "t", "ph")
  }

  /** The output mode [[latestPerKey]] requires. */
  val UpdateMode: OutputMode = OutputMode.Update()
}
