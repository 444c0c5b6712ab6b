package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions, so the SQL text interface reaches them
  * the same way the Column API does:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // …or spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(
      classOf[VectorExpressions.type].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // The native as-of join: logical node planned by a custom strategy,
    // with a pushdown rule Catalyst's own PushDownPredicates can't supply
    // for a node it doesn't know.
    ext.injectPlannerStrategy(session => new graft.plans.AsOfJoinStrategy(session))
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float vectors in double precision"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        VectorExpressions.FloatVectorDot(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_cosine expects 2 arguments, got ${args.length}")
        VectorExpressions.FloatVectorCosine(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("array_jaccard"),
      info("array_jaccard",
        "array_jaccard(a, b) - Jaccard similarity of two string arrays (distinct semantics)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"array_jaccard expects 2 arguments, got ${args.length}")
        TextExpressions.ArrayJaccardExpr(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      info("shingles",
        "shingles(text, width, step) - character shingle array (width/step must be int literals)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"shingles expects 3 arguments, got ${args.length}")
        TextExpressions.ShinglesExpr(args(0), litInt(args(1), "width"), litInt(args(2), "step"))
      }))
    ext.injectFunction((
      FunctionIdentifier("alnum_tokens"),
      info("alnum_tokens",
        "alnum_tokens(text, minLen) - lowercase alphanumeric tokens (minLen must be an int literal)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"alnum_tokens expects 2 arguments, got ${args.length}")
        TextExpressions.TokensExpr(args(0), litInt(args(1), "minLen"))
      }))
  }

  /** SQL-side structural parameters arrive as literal expressions; these
    * kernels specialize their generated code on them, so they must be
    * compile-time constants, not data.
    */
  private def litInt(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got: $other")
  }
}
