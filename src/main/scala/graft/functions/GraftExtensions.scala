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
    new ExpressionInfo(classOf[VectorExpressions.type].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
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
  }
}
