package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{FloatVectorDot, FloatVectorNegL2Sq}

/** SQL surface for the native vector expressions: register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`), then
  * `SELECT float_dot(a, b)` / `float_neg_l2sq(a, b)` work in SQL alongside
  * the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatVectorDot].getName, "float_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          FloatVectorDot(exprs(0), exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("float_neg_l2sq"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatVectorNegL2Sq].getName, "float_neg_l2sq"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          FloatVectorNegL2Sq(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_neg_l2sq", exprs => FloatVectorNegL2Sq(exprs(0), exprs(1)), "scala_udf")
  }
}
