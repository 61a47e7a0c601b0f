package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Md5Long, UnicodeNormalize, VectorCosine, VectorDot}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

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
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => {
        // form is a plan constant: accept only a foldable string literal
        val form = children(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize(expr, form): form must be a string literal, got $other")
        }
        UnicodeNormalize(children.head, form)
      }))
  }
}
