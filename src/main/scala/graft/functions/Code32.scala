package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 32-bit content code:
  * first 4 md5 bytes of the UTF-8 input as a Long in [0, 2^32) —
  * exactly [[graft.core.Ids.code32]], but codegen'd so it runs inside
  * whole-stage codegen instead of a deserializing Scala closure
  * (SURVEY §7.3: promote the hottest scalar to an Expression).
  *
  * SQL-reproducible (the oracle contract): conv(substr(md5(x),1,8),16,10).
  */
case class Code32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_code32 requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_code32"

  override protected def nullSafeEval(input: Any): Any =
    Code32Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Code32Impl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Code32 =
    copy(child = newChild)
}

/** Static implementation reachable from generated Java. */
object Code32Impl {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    val b = md5.get().digest(s.getBytes)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }
}

/** Session extensions wiring (spark.sql.extensions=graft.functions.GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.code32Descriptor)
    TextFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectFunction(ExtractSpansExpr.descriptor)
  }
}

object GraftFunctions {
  val code32Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_code32"),
    new ExpressionInfo(classOf[Code32].getName, "graft_code32"),
    (children: Seq[Expression]) => Code32(children.head)
  )

  /** Imperative registration for sessions built without the extensions
    * config (idempotent).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    (code32Descriptor +: ExtractSpansExpr.descriptor +: TextFunctions.descriptors)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
}
