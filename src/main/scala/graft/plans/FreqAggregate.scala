package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitter candidate sketch as a custom Catalyst
  * aggregate (`TypedImperativeAggregate`) — the second sketch on the
  * (b)-tier extension path (SURVEY.md §7.3), alongside
  * [[HllAgg]].
  *
  * The buffer is a counter map of at most `capacity` entries. The
  * classic guarantee: every item with true frequency > n/(capacity+1)
  * is GUARANTEED present in the final map (no false negatives above
  * that line), and each kept counter undercounts by at most
  * n/(capacity+1). `eval` returns just the candidate KEYS — the
  * caller re-counts them exactly in a second pass and applies the
  * real threshold, so the final answer is exact and deterministic
  * even though the sketch itself is partition-order-dependent
  * (see [[graft.operators.Sketches.heavyHitters]]).
  *
  * Scale shape: this is why the operator survives 100 TB — the token
  * stream is never shuffled. Each map task folds its partition into a
  * ≤ capacity-entry map (amortized O(1) per row: each overflow sweep
  * removes `capacity` count-units and inserts pay for removals), and
  * the shuffle carries one small map per task. `merge` implements the
  * mergeable-summaries rule (Agarwal et al., PODS'12): sum counters,
  * then subtract the (capacity+1)-th largest value from every counter
  * and drop the non-positive — the union keeps the same error bound,
  * so partial aggregation is lossless w.r.t. the guarantee.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < capacity) buf.update(key, 1L)
          else {
            // overflow sweep: decrement every counter, evict zeros.
            // The arriving item is NOT inserted (its single unit is
            // consumed by the sweep) — standard MG bookkeeping.
            val dead = mutable.ArrayBuffer.empty[String]
            buf.mapValuesInPlace((_, c) => c - 1)
            buf.foreach { case (k, c) => if (c <= 0) dead += k }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything;
      // ≥ capacity+1 entries exist so the pivot is well-defined and
      // at least one entry drops — post-merge size ≤ capacity
      val pivot = a.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - pivot)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // keys only, sorted for a canonical array value; surviving
    // counts are lower bounds, not exact — the re-count pass owns
    // the numbers
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString): Array[Any]): ArrayData
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      m.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_misra_gries"
}
