package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFD normalization as a codegen'd Catalyst expression — the
  * `unicodedata.normalize('NFD', text)` step of the reference's DPR
  * answer matching (dataprocess/NQ_dpr/get_answers.py:75-76). A native
  * expression (not a Scala UDF) keeps the containment join's corpus side
  * inside whole-stage codegen.
  */
object NfdNormalize {
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD))
}

case class NfdNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING child, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfd_normalize"

  override def nullSafeEval(input: Any): Any =
    NfdNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfdNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** NFD-normalize a string column. */
  def nfd(c: Column): Column =
    ColumnBridge.column(NfdNormalize(ColumnBridge.expression(c.cast("string"))))
}
