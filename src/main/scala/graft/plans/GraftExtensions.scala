package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Md5Long, VectorCosine, VectorDot}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql("... vector_cosine
  * (a, b) ...")` works anywhere the session does (installed by
  * [[graft.GraftSession.builder]] via `spark.sql.extensions`; any external
  * deployment can do the same with `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorCosine].getName, "vector_cosine"),
      (children: Seq[Expression]) => VectorCosine(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long"),
      (children: Seq[Expression]) => Md5Long(children.head)))
  }
}
