package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector kernels.
  *
  * The reference batches all of this through torch matmul
  * (MEVI/document_encoder.py:128-132); on Spark the equivalent "stay on the
  * fast path" move is a codegen'd `Expression` over primitive float arrays —
  * no boxing, no lambda dispatch, fuses into WholeStageCodegen with the
  * surrounding filter/project.
  *
  * Results are bit-identical to [[graft.core.VectorOps]]'s HOF forms
  * (Double accumulation, sequential fold) so either can back an oracle query.
  */
/** Both children must be ARRAY<FLOAT>: these kernels read elements with
  * `getFloat`, which on an UnsafeArrayData of doubles would reinterpret
  * half of each 8-byte value as garbage — the type must fail ANALYSIS,
  * not produce silently wrong numbers (cf. Md5PrefixHash's BINARY check).
  */
private[functions] trait FloatArrayBinaryCheck { self: BinaryExpression =>
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def checkInputDataTypes(): TypeCheckResult =
    (self.left.dataType, self.right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires two ARRAY<FLOAT> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
}

case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayBinaryCheck {

  override def dataType: DataType = DoubleType
  // null on length mismatch (matching the HOF form, where zip_with pads
  // with null and the fold propagates it) — a truncated dot product would
  // be silently wrong, not conservatively absent
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      // null elements propagate to a null result, matching the HOF fold
      // (toFloatArray would silently read them as 0.0)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** −‖a−b‖² as a single fused pass (RQ assignment hot loop, MEVI/pq.py:281-305). */
case class FloatVectorNegL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayBinaryCheck {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch, as above
  override def prettyName: String = "float_vector_neg_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    -s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = -$s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd inner product over two ARRAY<FLOAT> columns. */
  def float_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd −‖a−b‖². */
  def float_neg_l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorNegL2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
