package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Per-group top-k as a first-class operator — the tier-(c) Catalyst
  * extension (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * SURVEY.md §7.3): Spark has no per-group top-k, and the idiomatic
  * `row_number().over(partitionBy(key).orderBy(ord)) <= k` shuffles
  * EVERY input row and sorts every partition before discarding all
  * but k per key.
  *
  * This operator plans as partial → exchange → final: each map task
  * keeps a bounded k-row heap per key it sees, so the shuffle carries
  * at most k rows per (task, key) — the same partial-aggregation
  * geometry `max_by` gets, applied to top-k. At 100 TB with k=3 and
  * bounded key cardinality, that is the difference between shuffling
  * the corpus and shuffling ~k·keys rows. The exchange itself is NOT
  * hand-built: [[TopKPerKeyFinalExec]] declares
  * `ClusteredDistribution(keys)` and Spark's EnsureRequirements
  * inserts (or elides, if the child is already clustered) the
  * shuffle — bucketed inputs get a shuffle-free plan for free.
  *
  * Memory: one ≤k-element heap per distinct key per task. Unlike
  * Spark's hash aggregate this map does NOT spill to disk; instead the
  * PARTIAL side degrades gracefully — past
  * [[TopKPartition.DefaultMaxKeys]] distinct keys in one task it
  * flushes its current survivors downstream and starts a fresh map
  * (partial output is a candidate superset, so correctness is
  * unaffected; the shuffle just carries more than k rows for keys that
  * straddle a flush). The FINAL side holds keys/shuffle-partitions
  * heaps per task, which the caller sizes via
  * `spark.sql.shuffle.partitions`; for pathologically unbounded key
  * cardinality prefer the window-rank formulation, which sorts but
  * never builds a map.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

private[graft] object TopKPartition {
  /** Flush threshold for the PARTIAL side: at k=3 and ~100 B rows,
    * 2²⁰ keys ≈ 300 MB of heap state per task — past that, shipping a
    * candidate superset through the shuffle beats risking the
    * executor. */
  val DefaultMaxKeys: Int = 1 << 20

  /** Bounded per-key heaps over one partition: keeps the k rows that
    * sort FIRST under `ord` for each key; emits each key's survivors
    * in sorted order (deterministic output).
    *
    * `maxKeys` bounds the in-memory map: when a NEW key would exceed
    * it, current survivors are emitted and the map restarts. Only
    * valid where downstream re-reduces (the partial exec) — a key
    * straddling a flush yields up to k rows per flush segment. The
    * final exec passes `Int.MaxValue` (its per-task key count is
    * keys / shuffle-partitions, caller-sized). */
  def topK(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
           ord: Ordering[InternalRow], k: Int,
           maxKeys: Int = Int.MaxValue): Iterator[InternalRow] = {
    // max-heap under ord: head = the worst survivor, evicted first
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    def insert(row: InternalRow): Unit = {
      val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
        mutable.PriorityQueue.empty(ord))
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.compare(row, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(row.copy())
      }
    }
    if (maxKeys == Int.MaxValue) {
      // unbounded fast path: single map, lazily drained
      while (iter.hasNext) insert(iter.next())
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    } else new Iterator[InternalRow] {
      private var pending: Iterator[InternalRow] = Iterator.empty
      private def drain(): Iterator[InternalRow] = {
        // materialize before clear: ≤ maxKeys·k rows per flush
        val rows = heaps.valuesIterator
          .flatMap(_.dequeueAll.reverseIterator).toVector
        heaps.clear()
        rows.iterator
      }
      private def fill(): Unit = {
        while (!pending.hasNext && iter.hasNext) {
          val row = iter.next()
          if (heaps.size >= maxKeys && !heaps.contains(keyProj(row)))
            pending = drain()
          insert(row)
        }
        if (!pending.hasNext && heaps.nonEmpty) pending = drain()
      }
      override def hasNext: Boolean = { fill(); pending.hasNext }
      override def next(): InternalRow = { fill(); pending.next() }
    }
  }
}

/** Map-side partial: runs on whatever partitioning the child has.
  * Bounded memory: flushes its candidate heaps past
  * [[TopKPartition.DefaultMaxKeys]] distinct keys (the final pass
  * re-reduces, so flushing only widens the shuffle, never the
  * answer). */
case class TopKPerKeyPartialExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                                 k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, ord, kk, attrs) = (keys, ordering, k, child.output)
    child.execute().mapPartitions({ iter =>
      TopKPartition.topK(iter, UnsafeProjection.create(ks, attrs),
        RowOrdering.create(ord, attrs), kk, TopKPartition.DefaultMaxKeys)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Final: requires clustering on the keys — EnsureRequirements plants
  * the exchange (or skips it when the child is already clustered). */
case class TopKPerKeyFinalExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                               k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, ord, kk, attrs) = (keys, ordering, k, child.output)
    child.execute().mapPartitions({ iter =>
      TopKPartition.topK(iter, UnsafeProjection.create(ks, attrs),
        RowOrdering.create(ord, attrs), kk)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as partial → (exchange) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child) =>
      TopKPerKeyFinalExec(keys, ordering, k,
        TopKPerKeyPartialExec(keys, ordering, k, planLater(child))) :: Nil
    case _ => Nil
  }

  /** Idempotent registration on any session (the
    * `experimental.extraStrategies` route works without extensions
    * configured at session build time). */
  def setup(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
}
