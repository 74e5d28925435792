package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Second-moment (Gram) accumulator over a vector column as a custom
  * Catalyst aggregate — the statistics pass behind PCA/whitening
  * (SURVEY.md §7.3 (b)-tier; LLM-pipeline extension §2.11).
  *
  * Buffer layout (`Array[Double]`, length 1 + d + d(d+1)/2):
  * `[0]` row count, `[1..d]` per-dimension sums, then the upper
  * triangle of Σ xᵢxⱼ row-major. `update` folds one vector in O(d²);
  * `merge` is element-wise add — associative, so Spark plans a
  * map-side partial aggregate and the shuffle carries ONE ~17 KB
  * buffer per task regardless of row count. That is the whole scale
  * story: covariance of a 100 TB corpus costs one scan plus a
  * d²-sized reduction; the naive explode-(i,j)-then-groupBy dual
  * shuffles n·d(d+1)/2 rows.
  *
  * NULL vectors are skipped (carry no moment information); a vector
  * of the wrong width fails loudly — silently truncating would
  * corrupt the triangle indexing.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, s"dim must be positive, got $dim")

  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"GramAgg(dim=$dim) got a vector of width ${arr.numElements()}")
      val elemIsFloat = child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf(0) += 1.0
      i = 0
      var t = 1 + dim
      while (i < dim) {
        buf(1 + i) += x(i)
        var j = i
        while (j < dim) {
          buf(t) += x(i) * x(j)
          t += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(java.lang.Double.valueOf): Array[Any])

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_gram"
}
