package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: registers graft's native Catalyst
  * expressions on every session built with it, so SQL users get them
  * without imperative registration:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * (Programmatic users can still call `GraftFunctions.register` on an
  * existing session — both paths install the SAME builders from the
  * one `GraftFunctions.sqlKernels` catalog, so the surfaces cannot
  * drift. Aggregates work in GROUP BY directly: the analyzer wraps a
  * returned AggregateFunction in its AggregateExpression.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    for ((name, className, builder) <- graft.functions.GraftFunctions.sqlKernels)
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    // Fuse the declarative aggregate(zip_with(·,·,*),0.0,+) idiom into
    // the codegen kernel on every query (see graft.plans.FuseDotProduct).
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
  }

}
