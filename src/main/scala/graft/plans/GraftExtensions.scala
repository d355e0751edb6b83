package graft.plans

import graft.functions.{PolyHash, VectorDot, VectorL2Sq}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension installer (the `SparkSessionExtensions` path from
  * SURVEY.md §7.3): makes graft's native expressions available in every
  * session created with
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * or programmatically via `.withExtensions(new GraftExtensions)`.
  * Unlike `GraftFunctions.register` (temp functions on one session),
  * extension-injected functions survive session cloning and are
  * available to pure-SQL users from the first query.
  *
  * No custom Rule/Strategy is injected: SURVEY.md §4's conclusion — the
  * reference needs none, and the built-in operators (WindowGroupLimit
  * top-k, AQE skew handling, broadcast selection) already produce the
  * plans a custom strategy would — held up in PLANS.md.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    // the vector kernels: fused codegen'd float-array math for pure-SQL
    // ANN/similarity users (PqEncode/MatVec are NOT here — they embed a
    // fitted model as plan literals, which no SQL call site can supply)
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_l2sq"),
      new ExpressionInfo(classOf[VectorL2Sq].getName, "vector_l2sq"),
      (children: Seq[Expression]) => VectorL2Sq(children(0), children(1))))
  }
}
