package graft.expressions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API.
  *
  * Two paths:
  *  - cluster deployment: `--conf spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (the SparkSessionExtensions hook, applied at session build);
  *  - running session (tests, the driver's Verify/Bench): `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorBinaryExpression].getName, name),
        builder))
    }
}

object GraftFunctions {
  private def binary(f: (Expression, Expression) => Expression)(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"expected 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> binary(DotProduct) _,
    "vec_l2sq" -> binary(L2SquaredDistance) _,
    "vec_cosine" -> binary(CosineSimilarity) _)

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
