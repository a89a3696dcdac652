package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotFixedExpr, MinHashSigExpr, SimHash64Expr}
import graft.plans.{CosineFloatExpr, SimilarityJoinRewrite}

/** SparkSessionExtensions entry point: installs graft's native
  * functions into every session built with these extensions — the
  * deployment-grade alternative to per-query temp registration
  * (usable via `spark.sql.extensions=graft.GraftExtensions` on any
  * spark-submit, no code changes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_minhash32"),
      info("graft_minhash32", "_FUNC_(array<string>) - 32-permutation MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSigExpr(exprs.head, 32)))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "_FUNC_(array<string>) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_dot_fixed"),
      info("graft_dot_fixed", "_FUNC_(array<long>, array<long>) - exact integer dot product"),
      (exprs: Seq[Expression]) => DotFixedExpr(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "_FUNC_(array<float>, array<float>) - cosine similarity"),
      (exprs: Seq[Expression]) => CosineFloatExpr(exprs.head, exprs(1))))
    // Opt-in: with spark.graft.similarityRewrite.planes > 0, cosine-
    // threshold cross joins become LSH-bucketed equi-joins.
    e.injectOptimizerRule(_ => SimilarityJoinRewrite())
  }
}
