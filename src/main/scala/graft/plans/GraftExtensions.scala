package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension injecting graft's native functions, usable either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build or
  * `GraftFunctions.register(spark)` at runtime. After registration the
  * functions resolve in SQL and through `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  private def minhashBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, "graft_minhash_sig(shingles, k)")
    val k = children(1).eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"k must be an integer literal, got $other")
    }
    MinHashSigExpr(children.head, k)
  }

  private def rhpBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 4,
      "graft_rhp_sig(vec, nPlanes, dim, seed)")
    def intArg(i: Int, what: String): Int = children(i).eval() match {
      case v: Int => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    val seed = children(3).eval() match {
      case v: Long => v
      case v: Int => v.toLong
      case other => throw new IllegalArgumentException(
        s"seed must be an integer literal, got $other")
    }
    RhpSigExpr(children.head, intArg(1, "nPlanes"), intArg(2, "dim"), seed)
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      minhashBuilder),
    (FunctionIdentifier("graft_rhp_sig"),
      new ExpressionInfo(classOf[RhpSigExpr].getName, "graft_rhp_sig"),
      rhpBuilder))

  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
