package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, PortableHash64, VecDot}

/** Session-extension entry point: injects the engine's native Catalyst
  * functions at session build, the idiomatic deployment path —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * // or programmatically: .withExtensions(new GraftExtensions)
  * }}}
  *
  * after which `cosine_sim` / `vec_dot` resolve in any SQL or
  * `call_function` expression with no per-session registration call, and
  * the [[graft.plans.AsOfJoinNode]] custom operator plans through
  * [[graft.plans.AsOfJoinStrategy]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSim]),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", classOf[VecDot]),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("portable_hash64"),
      info("portable_hash64", classOf[PortableHash64]),
      (exprs: Seq[Expression]) => PortableHash64(exprs(0))))
  }
}
