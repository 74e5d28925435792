package graft.operators

import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan parallelization for CPU-dense per-row operators
  * (optimization guide §2.5 "input skew: one huge unsplittable file …
  * repartition immediately after the read", §1.1 first-principles).
  *
  * The harness corpora arrive as ONE parquet row group per table, so a
  * scan yields one partition and every stage pipelined onto it —
  * shingling, the per-shingle md5 of MinHash, PQ distance folds — runs
  * on a single core while the other 31 idle (measured r14: q319's two
  * PQ assign passes were 1.7 s each, single-task, 96% CPU; q203/q314's
  * shingle+minhash stages 1.3–1.7 s single-task). AQE cannot help: its
  * coalescing is byte-based and these stages are CPU-dense at tiny
  * byte sizes — the one cost model byte-based partitioning cannot see.
  *
  * [[widen]] round-robins the input up to the session's default
  * parallelism ONLY when the plan's partition count is below it, so at
  * production scale (scans yielding ≥ cores splits) it is the identity
  * — no extra Exchange ever appears in a 100 TB plan. The shuffle it
  * inserts locally moves the raw rows once (repartition is
  * deterministic: sort-before-repartition stays on, SPARK-23207) and
  * every consumer aggregates or joins by key afterwards, so results
  * are placement-independent — the DuckDB oracle re-verifies all
  * consumers bit-for-bit. */
object Fanout {
  /** HASH repartition on a key DERIVED from `key`, not round-robin
    * and not the raw key itself:
    *
    *  - a keyless `repartition(n)` first pays a local sort of its
    *    input (`sortBeforeRepartition`, needed for deterministic
    *    retries — SPARK-23207; measured r14: 600–840 ms single-task
    *    map stages on the text corpora);
    *  - repartitioning on the RAW id satisfies the downstream
    *    `groupBy(id)` clustering, which eliminates that exchange and
    *    fuses scan→explode→FULL aggregation into one stage — partial
    *    (map-side) aggregation is lost and the heavy stage gets
    *    heavier (measured r14: q203 4.3 s → 6–25 s, unstable);
    *  - `pmod(xxhash64(key), target·64)` is the guide-§2.5 synthetic
    *    deterministic key: retry-stable, high-cardinality (64 values
    *    per partition, so the hash spreads evenly), sort-free on the
    *    map side, and opaque to downstream clustering so every
    *    aggregation keeps its partial/final split. */
  private[graft] def widen(df: DataFrame, key: Column): DataFrame = {
    // ONLY scan-rooted pipelines (project/filter over leaves) are
    // widened. Two reasons, both measured r14: (1) a frame containing
    // a join/aggregate already crosses an exchange, so its downstream
    // side runs at shuffle parallelism — widening adds nothing; (2)
    // probing the partition count via .rdd PREPARES the physical plan,
    // and on a broadcast-join-bearing frame doPrepare launches the
    // broadcast job — executing the frame's whole upstream pipeline a
    // second time outside the plan (q453 2.5 s → 5.2 s when the
    // verify-path shingle frame, a semi-join, was probed).
    // a streaming frame cannot be .rdd-probed at all (AnalysisException
    // at plan construction) — widen is a no-op there by contract
    // (ADVICE r14): micro-batches are already source-split, and the
    // repartition would add per-batch exchanges
    if (df.isStreaming) return df
    val shuffles = df.queryExecution.logical.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
      // the same early-job hazard as broadcast joins (ADVICE r14):
      // preparing a plan bearing these nodes can launch work before
      // the timed action — Distinct/Window cross an exchange anyway
      // (reason 1), and a subquery's doPrepare runs the subquery
      case d: org.apache.spark.sql.catalyst.plans.logical.Distinct => d
      case dd: org.apache.spark.sql.catalyst.plans.logical.Deduplicate => dd
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])) => p
    }
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (shuffles.isEmpty && df.rdd.getNumPartitions < target)
      df.repartition(target, pmod(xxhash64(key), lit(target.toLong * 64)))
    else df
  }

  /** Unconditional fan-out for frames the CALLER knows are narrow and
    * bounded — e.g. the candidate-involved verify set of the LSH
    * pipelines: a broadcast semi-join preserves its left side's 1–2
    * scan partitions, so the verify shingle ran single-task (r14:
    * ~0.6 s inside every incremental near-dup query), but the frame
    * itself is candidates-sized by construction, so the exchange this
    * inserts is small at ANY corpus scale. No `.rdd` probe (on a
    * join-bearing frame it would fire the broadcast job early); same
    * derived key as [[widen]]. */
  private[graft] def widenUnchecked(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(target, pmod(xxhash64(key), lit(target.toLong * 64)))
  }
}
