package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Digest kernel for [[Md5Long]]. A thread-local MessageDigest instance:
  * `getInstance` per row would dominate the hash itself. Called from
  * generated code via the object's static forwarder. */
object Md5LongKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes), read big-endian — bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)::long` in any engine: 15 hex
    * digits are the first 7.5 digest bytes, always non-negative in a long. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get(); d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 52) | ((h(1) & 0xffL) << 44) | ((h(2) & 0xffL) << 36) |
      ((h(3) & 0xffL) << 28) | ((h(4) & 0xffL) << 20) | ((h(5) & 0xffL) << 12) |
      ((h(6) & 0xffL) << 4) | ((h(7) & 0xffL) >>> 4)
  }

  def hashUtf8(s: UTF8String): Long = hash(s.getBytes)
}

/** Native form of the engine's cross-engine 60-bit content hash
  * ([[graft.operators.TextAnalysis.md5Long]]): the built-in route is
  * `conv(substring(md5(c), 1, 15), 16, 10).cast(long)` — digest → 32-char
  * hex string → substring → base-16 STRING PARSE per row. This expression
  * reads the 60 bits straight off the digest bytes: same value for every
  * input (bit-parity spec-asserted), no hex-string round trip, codegen'd.
  * SQL name `md5_long` via [[graft.plans.GraftExtensions]]. */
case class Md5Long(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_long requires a string or binary input, got ${other.catalogString}")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5LongKernel.hashUtf8(s)
    case b: Array[Byte] => Md5LongKernel.hash(b)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case _: StringType => s"graft.functions.Md5LongKernel.hashUtf8($c)"
      case _ => s"graft.functions.Md5LongKernel.hash($c)"
    })
}

object Md5LongFunction {
  def md5Long(c: Column): Column =
    ColumnBridge.column(Md5Long(ColumnBridge.expression(c)))
}
