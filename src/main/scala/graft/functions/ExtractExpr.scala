package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.route.Extract

/** The span-routing hot path as a NATIVE Catalyst expression
  * (`graft_extract_spans(spans)`): consumes the spans array column as raw
  * `ArrayData`/`InternalRow`/`UTF8String` and emits the extracted span
  * structs directly — no `DocIn`/`SpanIn` object graph on the way in and no
  * `DocOut` encoder on the way out. This attacks the measured pipeline
  * ceiling (BENCH.md: Catalyst deserialization, not extraction, bounds
  * throughput): the only per-span allocations left are the two strings the
  * parser itself needs.
  *
  * Semantics == [[Extract.extractDoc]]'s span output exactly (stable offset
  * sort, maxSpans cap, per-kind routing, dense order re-index) — asserted in
  * ExtractExprSpec against the typed twin.
  */
case class ExtractSpansExpr(child: Expression) extends UnaryExpression {

  private def spanStruct: Option[StructType] = child.dataType match {
    case ArrayType(s: StructType, _)
      if Seq("kind", "text", "media_ref", "offset").forall(f => s.fieldNames.contains(f)) =>
      Some(s)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (spanStruct.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct{kind,text,media_ref,offset}>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ExtractSpansExpr.OutType
  override def prettyName: String = "graft_extract_spans"

  @transient private lazy val idx: (Int, Int, Int, Int, Int) = {
    val s = spanStruct.get
    // the struct's REAL field count must reach getStruct: decoding an
    // UnsafeRow with the wrong arity misreads the null bitset and offsets
    (s.fieldIndex("kind"), s.fieldIndex("text"),
      s.fieldIndex("media_ref"), s.fieldIndex("offset"), s.length)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val (ki, ti, ri, oi, nf) = idx
    ExtractSpansExpr.compute(input.asInstanceOf[ArrayData], ki, ti, ri, oi, nf)
  }

  // falls back to the interpreted eval via a static call — the work is the
  // parser itself, not expression glue, so codegen'd dispatch adds nothing
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ki, ti, ri, oi, nf) = idx
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExtractSpansExpr.compute($c, $ki, $ti, $ri, $oi, $nf)")
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractSpansExpr =
    copy(child = newChild)
}

object ExtractSpansExpr {
  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("order", IntegerType, nullable = false))), containsNull = false)

  private val Empty = UTF8String.EMPTY_UTF8

  /** Static impl reachable from generated Java. Mirrors Extract.extractDoc's
    * span loop on raw Catalyst data.
    */
  def compute(spans: ArrayData, ki: Int, ti: Int, ri: Int, oi: Int, numFields: Int): ArrayData = {
    val cfg = Extract.DefaultConfig
    val n = spans.numElements()
    require(n < (1 << 20), s"span array too wide for packed sort keys: $n")
    // stable offset sort via packed (offset, index) long keys — matches
    // extractDoc's stable sortBy; offset biased to unsigned so negative
    // offsets order correctly
    val order = new Array[Long](n)
    var i = 0
    while (i < n) {
      val off = spans.getStruct(i, numFields).getInt(oi)
      order(i) = ((off.toLong - Int.MinValue.toLong) << 20) | i.toLong
      i += 1
    }
    java.util.Arrays.sort(order)
    val m = math.min(n, cfg.maxSpans)
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val srcIdx = (order(i) & 0xfffff).toInt
      val row = spans.getStruct(srcIdx, numFields)
      val kind = row.getUTF8String(ki)
      val text = row.getUTF8String(ti)
      val ref = row.getUTF8String(ri)
      val (txt, _) = Extract.extractSpan(
        if (kind == null) "" else kind.toString,
        if (text == null) null else text.toString, cfg)
      out(i) = new GenericInternalRow(Array[Any](
        if (kind == null) Empty else kind,
        UTF8String.fromString(txt),
        if (ref == null) Empty else ref,
        i))
      i += 1
    }
    new GenericArrayData(out)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_extract_spans"),
    new ExpressionInfo(classOf[ExtractSpansExpr].getName, "graft_extract_spans"),
    (cs: Seq[Expression]) => ExtractSpansExpr(cs.head)
  )
}
