package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native graft expressions.
  *
  * Two integration paths (same function list):
  *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  *    construction (the standard library-extension mechanism), or
  *  - `GraftFunctions.register(spark)` on an already-running session.
  *
  * After either, `spark.sql("SELECT float_vec_dot(a, b) ...")` works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("float_vec_sum",
      new ExpressionInfo(classOf[FloatVecSumAgg].getName, "float_vec_sum"),
      (args: Seq[Expression]) => FloatVecSumAgg(args.head)
        .toAggregateExpression())
  )

  /** Register everything on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftSql.registerFunction(spark, name, builder)
    }
}
