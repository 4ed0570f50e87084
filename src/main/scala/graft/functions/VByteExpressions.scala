package graft.functions

import graft.codec.VByte
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the posting codec (E4 promoted to the
  * SQL surface, per SURVEY.md §7 step 11):
  *   vbyte_encode(array<bigint>) → binary   (delta-gap + VByte)
  *   vbyte_decode(binary) → array<bigint>
  * Exact inverses — the lossless-codec contract of the reference's
  * encode/decode_token_ids (midi_tokenizer.py:3008-3073). */
case class VByteEncode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vbyte_encode expects array<bigint>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vbyte_encode"
  override def nullSafeEval(input: Any): Any =
    VByte.encodeDocIds(input.asInstanceOf[ArrayData].toLongArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.VByte.encodeDocIds($c.toLongArray())")
  override protected def withNewChildInternal(newChild: Expression): VByteEncode =
    copy(child = newChild)
}

case class VByteDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vbyte_decode expects binary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vbyte_decode"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(VByte.decodeDocIds(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.codec.VByte.decodeDocIds($c))")
  override protected def withNewChildInternal(newChild: Expression): VByteDecode =
    copy(child = newChild)
}

object VByteExpressions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vbyte_encode", exprs => VByteEncode(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vbyte_decode", exprs => VByteDecode(exprs.head), "scala_udf")
  }
}
