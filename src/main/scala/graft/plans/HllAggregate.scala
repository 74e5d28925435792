package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** HyperLogLog distinct-count estimate as a custom Catalyst aggregate
  * (`TypedImperativeAggregate`) — the (b)-tier extension path of
  * SURVEY.md §7.3 for sketches that built-in aggregates can't
  * express as mergeable state.
  *
  * The buffer is the raw 256-byte register array: `update` folds one
  * value into its bucket's max-rho register, `merge` is element-wise
  * max — exactly the structure that makes HLL distribute (registers
  * merge associatively across partitions, so Spark plans a partial
  * aggregate map-side and the shuffle carries 256 bytes per group,
  * independent of input cardinality).
  *
  * Bit-derivation matches [[graft.operators.Sketches.hllDistinct]]
  * (md5 → 60-bit int → bucket = low 8 bits, rho over the top 52):
  * the two formulations produce identical registers. The estimate
  * here folds the registers as the EXACT integer sum
  * S = Σ 2^(53−M_j) (≤ 256·2^53 < 2^62, no overflow), so it is
  * summation-order-free and the DuckDB oracle reproduces it
  * bit-for-bit — the declarative q38 form's FP fold agrees within
  * 1e-6 relative (spec-asserted).
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 256

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // same md5→60-bit derivation as HashFunctions.md5Long: the first
      // 15 hex digits = top 60 bits of the first 8 digest bytes. The
      // digest instance is thread-local and the value is extracted
      // arithmetically — no per-row allocation beyond the digest's own
      // output array (hex-string formatting was measurable garbage at
      // corpus scale)
      val md = HllAgg.digest.get()
      md.reset()
      val d = md.digest(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4 // 15 hex digits = 60 bits
      val bucket = (h & 255L).toInt
      val w = h >>> 8
      val rho = if (w > 0) 53 - (64 - java.lang.Long.numberOfLeadingZeros(w)) else 53
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact integer register sum: 2^-M_j scaled by 2^53 — order-free,
    // so the estimate (not just the registers) is oracle-replayable
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      s += 1L << (53 - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    // 0.718272 * 65536 * 2^53 / S, literal order mirrored in the q46
    // oracle SQL so both engines perform the identical IEEE ops
    val raw = 0.718272 * 65536.0 * 9007199254740992.0 / s.toDouble
    // linear-counting small-range correction, mirrored in
    // Sketches.hllDistinct and the q38 oracle SQL
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hll_distinct"
}

object HllAgg {
  /** Executor-thread-local MD5 instance — MessageDigest is not
    * thread-safe and allocating one per row is hot-path garbage. */
  private val digest: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}
