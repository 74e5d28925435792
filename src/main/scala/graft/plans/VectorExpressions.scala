package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the similarity hot path
  * (SURVEY.md §7.3: "custom codegen Expression only if bench
  * demands" — the `aggregate`/`zip_with` higher-order chain is
  * interpreted per element, which dominates pairwise similarity; these
  * compile to a tight primitive loop inside whole-stage codegen).
  *
  * Arithmetic contract: left-to-right double-precision fold, exactly
  * the order of `aggregate(zip_with(a,b,(x,y)=>x*y),0d,_+_)` and of
  * the DuckDB oracle's `list_sum(list_transform(...))` — results are
  * bit-identical to the declarative formulation they replace, for
  * EVERY input: mismatched lengths yield NULL (the HOF's `zip_with`
  * null-pads the shorter array, collapsing the sum to NULL), and so
  * does a null element. Full equivalence is what lets
  * [[AccelerateDotProduct]] rewrite unconditionally; the per-element
  * null check is only emitted when the child schema says elements can
  * actually be null (`containsNull`), so dense `array<float>` pays
  * nothing for it.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[ArrayType] — AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null inputs, ragged (length-mismatch) pairs, and null elements
  // all produce null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** sqrt(dot(a, a)) in one pass. Same NULL contract as [[DotProductF]]:
  * a null element makes the whole norm NULL (matching the HOF
  * `aggregate` fold), with the check compiled out for provably-dense
  * element types. */
case class L2NormF(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null input and null elements both produce null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm"

  private def elementsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val checkNulls = elementsNullable
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (checkNulls && x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($acc); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormF =
    copy(child = newChild)
}

/** The PQ ×10¹²-quantized squared-distance fold
  * (`aggregate(zip_with(a,b,(x,y)=>floor((x−y)²·1e12+0.5) :: long),
  * 0L, _+_)`) as a native codegen expression — the single hottest
  * expression of the PQ family: it runs once per (candidate, code)
  * pair in every fit/encode/ADC pass (~rows·m·k calls per query), and
  * the interpreted HOF chain was measured at ~1–2 µs/call vs ~50 ns
  * for this loop (r14 profile: the two assign stages dominated every
  * PQ query).
  *
  * Exactness contract (bit-identical to the HOF formulation for EVERY
  * input, same bar as [[DotProductF]]):
  *  - either input NULL → NULL (`nullIntolerant`);
  *  - length mismatch → NULL (zip_with null-pads, collapsing the sum);
  *  - a NULL element → NULL (null term nulls the fold);
  *  - per element: `(long) Math.floor((x−y)·(x−y)·1e12 + 0.5)` — the
  *    identical double arithmetic and the identical non-ANSI
  *    double→long cast (NaN → 0, ±∞ clamps), summed left-to-right
  *    with Java long wraparound, exactly like the `acc + v` fold.
  * Inputs are `array<double>` (the unit-normalized subvector form all
  * call sites use). */
case class QDist12F(left: Expression, right: Expression)
    extends BinaryExpression {

  /** float↔double mixes are accepted — the HOF this replaces promoted
    * them to DOUBLE subtraction (Spark's Subtract coercion), which is
    * exactly the kernel's widen-then-subtract. float-float is
    * REJECTED: the HOF would have subtracted in FLOAT precision there,
    * a different rounding this kernel does not reproduce (no such
    * call site exists; the check keeps a future one honest). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    val bothFloat = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType) && !bothFloat)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<double>/array<float> args, not both " +
          s"float (got ${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qdist12"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsNullable && QDist12F.anyNull(x, y, n)) return null
    QDist12F.fold(x, y, n, isFloat(left), isFloat(right))
  }

  // ONE static call, not an inlined loop (the [[JaroWinkler]]
  // pattern): inlining the fold bloats the whole-stage-codegen consume
  // method past the JVM's huge-method JIT limit, and the entire stage
  // then runs in the bytecode interpreter — measured r14: q319's
  // assign stages DOUBLED in CPU with the loop inlined. A small static
  // keeps the generated method compact and the kernel itself JIT-hot.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val nullCheck = if (elementsNullable)
        s" || graft.plans.QDist12F.anyNull($a, $b, $n)" else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()$nullCheck) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.QDist12F.fold($a, $b, $n,
         |    ${isFloat(left)}, ${isFloat(right)});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDist12F =
    copy(left = newLeft, right = newRight)
}

/** Static kernel halves of [[QDist12F]]'s codegen (called from
  * generated code; see the doGenCode note on the huge-method limit). */
object QDist12F {
  def anyNull(a: ArrayData, b: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def fold(a: ArrayData, b: ArrayData, n: Int,
           aFloat: Boolean, bFloat: Boolean): Long = {
    var acc = 0L
    var i = 0
    while (i < n) {
      val av = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val bv = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = av - bv
      acc += math.floor(d * d * 1e12 + 0.5).toLong
      i += 1
    }
    acc
  }
}
