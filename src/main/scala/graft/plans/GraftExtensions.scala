package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions as SQL
  * functions — enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or list them in an existing extensions chain). After that,
  * `expr("graft_dot(a, b)")` / `graft_norm(v)` resolve through the
  * normal Catalyst path: analyzable, optimizable, codegen'd. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductF(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2NormF].getName, "graft_norm"),
      (args: Seq[Expression]) => L2NormF(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => JaroWinklerSim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_distinct"),
      new ExpressionInfo(classOf[HllAgg].getName, "graft_hll_distinct"),
      (args: Seq[Expression]) => HllAgg(args(0))))
    // graft_rolling_fps(text, w, keepMod): w/keepMod must be literals
    // (they parameterize the generated code, not per-row inputs);
    // validated here so malformed SQL fails with a message, not an
    // IndexOutOfBounds/eval crash
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fps"),
      new ExpressionInfo(classOf[RollingFingerprints].getName, "graft_rolling_fps"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_rolling_fps(text, w, keepMod) takes 3 arguments, got ${args.length}")
        def intLit(e: Expression, name: String): Int = {
          require(e.foldable, s"graft_rolling_fps: $name must be an integer literal")
          e.eval().asInstanceOf[Number].intValue()
        }
        RollingFingerprints(args(0), intLit(args(1), "w"), intLit(args(2), "keepMod"))
      }))
    // auto-accelerate the portable HOF dot-product pattern
    ext.injectOptimizerRule(_ => AccelerateDotProduct)
  }
}
