package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

/** SparkSessionExtensions hook exposing graft's native expressions to SQL
  * (set spark.sql.extensions=graft.expressions.GraftExtensions — done by
  * graft.core.Sessions.tune). SQL users get `graft_dot(a, b)` etc. with
  * the same codegen'd implementation the Scala API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))

    // cosine(a, b) composed from the same codegen'd dot product
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        val (a, b) = (children(0), children(1))
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
  }
}
