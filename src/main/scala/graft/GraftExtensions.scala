package graft

import graft.functions.{DoubleVecDot, FloatVecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions: installs the engine's native expressions into any
  * SparkSession built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * production wiring for clusters where sessions are created by the
  * platform, not the library (per-session `FloatVecDot.register` remains
  * for ad-hoc use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleVecDot].getName, "double_dot"),
      (exprs: Seq[Expression]) => DoubleVecDot(exprs(0), exprs(1))))
  }
}
