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
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorBinaryExpression].getName, name),
        builder))
    }
    // whole-operator extension: the merge as-of join's planner strategy
    // and its filter-pushdown optimizer rule (graft.plans); the runtime
    // path for an already-running session is GraftBridge.addStrategy /
    // addOptimizerRule
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftFunctions {
  private def binary(f: (Expression, Expression) => Expression)(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"expected 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  private def topkBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3, s"topk_by_score(score, id, k): got ${args.length} arguments")
    val k = args(2) match {
      case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException("topk_by_score: k must be a literal")
    }
    TopKByScore(args(0), args(1), k)
  }

  private def literalInt(e: Expression, what: String): Int = e match {
    case x if x.foldable => x.eval().asInstanceOf[Number].intValue()
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  private def minhashBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"minhash_sigs(shingles, numHashes): got ${args.length} arguments")
    MinhashSignatures(args(0), literalInt(args(1), "minhash_sigs: numHashes"))
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"simhash_sig(tokens): got ${args.length} arguments")
    SimhashSignature(args(0))
  }

  private def shinglesBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"ngram_shingles(tokens, n): got ${args.length} arguments")
    NGramShinglesExpr(args(0), literalInt(args(1), "ngram_shingles: n"))
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> binary(DotProduct) _,
    "vec_l2sq" -> binary(L2SquaredDistance) _,
    "vec_cosine" -> binary(CosineSimilarity) _,
    "topk_by_score" -> (topkBuilder _),
    "ngram_shingles" -> (shinglesBuilder _),
    "minhash_sigs" -> (minhashBuilder _),
    "simhash_sig" -> (simhashBuilder _))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
