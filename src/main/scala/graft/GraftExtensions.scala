package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.BinaryType
import graft.functions.{FloatVectorDot, FloatVectorNegL2Sq, Md5PrefixHash, NfdNormalize}

/** SQL surface for ALL the native (codegen'd) graft expressions:
  * register with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.GraftExtensions`),
  * then `SELECT float_dot(a, b)`, `float_neg_l2sq(a, b)`,
  * `md5_prefix(s, nibbles)` and `nfd_normalize(s)` work in SQL
  * alongside the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftExtensions].getName, name),
          builder))
    }
}

object GraftExtensions {

  /** `md5_prefix(expr, nibbles)`: nibbles must be a literal — the width
    * is part of the expression's identity (it fixes the output's bit
    * range), not a per-row value. */
  private def md5Builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "md5_prefix(expr, nibbles) takes 2 arguments")
    require(exprs(1).foldable, "md5_prefix nibbles must be a literal")
    Md5PrefixHash(Cast(exprs(0), BinaryType),
      exprs(1).eval().asInstanceOf[Number].intValue)
  }

  /** One builder per SQL name — `new GraftExtensions` (injection) and
    * [[register]] (temp functions on a live session) share the list so
    * the two registration paths can never drift. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> (exprs => FloatVectorDot(exprs(0), exprs(1))),
    "float_neg_l2sq" -> (exprs => FloatVectorNegL2Sq(exprs(0), exprs(1))),
    "md5_prefix" -> md5Builder,
    "nfd_normalize" -> (exprs => NfdNormalize(exprs(0))))

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
