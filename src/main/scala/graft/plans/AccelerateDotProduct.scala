package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order dot-product
  * pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProductF]] when both inputs are
  * `array<float>`. The HOF form is the portable/spec form (it is what
  * the DuckDB oracle mirrors and what [[graft.operators.Similarity.dotHof]]
  * builds); this rule lets any plan written that way — including raw
  * SQL — run on the tight primitive loop instead of per-element
  * interpretation, with bit-identical results (same left-to-right
  * double fold).
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule` — an
  * example of extending Catalyst at the (c) tier (SURVEY.md §7.3)
  * without touching query code.
  */
object AccelerateDotProduct extends Rule[LogicalPlan] {

  // any array<float> qualifies: DotProductF reproduces the HOF form's
  // NULL semantics for ragged lengths AND null elements (see its
  // scaladoc), so the rewrite is unconditionally semantics-preserving
  // — including for parquet-read arrays, whose elements are nullable
  // in the schema even when the data is dense.
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private object DoubleOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(c, DoubleType, _, _) => Some(c)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(DoubleOf(x: NamedLambdaVariable),
                DoubleOf(y: NamedLambdaVariable), _), Seq(lx, ly), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(lacc, lv), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(lfin), _))
          if zero == 0.0 && isFloatArray(a) && isFloatArray(b) &&
            x.exprId == lx.asInstanceOf[NamedLambdaVariable].exprId &&
            y.exprId == ly.asInstanceOf[NamedLambdaVariable].exprId &&
            acc.exprId == lacc.asInstanceOf[NamedLambdaVariable].exprId &&
            v.exprId == lv.asInstanceOf[NamedLambdaVariable].exprId &&
            fin.exprId == lfin.asInstanceOf[NamedLambdaVariable].exprId =>
        DotProductF(a, b)
    }
}
