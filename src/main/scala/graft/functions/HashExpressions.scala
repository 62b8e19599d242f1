package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd md5-prefix hash — the engine's most common primitive.
  *
  * Every deterministic "random" in the engine (MinHash permutation input,
  * sampling ranks, id bucketing; see graft.pipeline.Dedup's scaladoc) is
  * `conv(substr(md5(x), 1, nibbles), 16, 10)` so the DuckDB oracle can
  * replay it as `CAST('0x' || substr(md5(x), 1, n) AS BIGINT)`. The
  * composed Spark form allocates a 32-char hex string, a substring, and a
  * decimal string per row; this expression digests once and assembles the
  * same value with shifts — identical output, no intermediate strings.
  */
object Md5PrefixHash {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first `nibbles` hex chars of md5(bytes), base 16.
    * Bit-identical to `conv(substr(md5(x),1,nibbles),16,10)::long` for
    * nibbles ≤ 15 (60 bits — always a positive long).
    */
  def hash(bytes: Array[Byte], nibbles: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    val dig = md.digest(bytes)
    var v = 0L
    var i = 0
    val full = nibbles / 2
    while (i < full) { v = (v << 8) | (dig(i) & 0xFF); i += 1 }
    if (nibbles % 2 == 1) v = (v << 4) | ((dig(full) & 0xF0) >>> 4)
    v
  }
}

/** `md5_prefix(child, nibbles)` over a BINARY child → LONG. The public
  * constructor is [[HashFunctions.md5_prefix]], which casts the input to
  * binary; a non-binary child fails analysis via checkInputDataTypes.
  */
case class Md5PrefixHash(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15, s"nibbles must be in [1,15]: $nibbles")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY child, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(input: Any): Any =
    Md5PrefixHash.hash(input.asInstanceOf[Array[Byte]], nibbles)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5PrefixHash.hash($c, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** First `nibbles` hex chars of md5 as a long (string/binary input). */
  def md5_prefix(c: Column, nibbles: Int): Column =
    ColumnBridge.column(Md5PrefixHash(
      ColumnBridge.expression(c.cast("binary")), nibbles))
}
