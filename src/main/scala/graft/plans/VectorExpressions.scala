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
