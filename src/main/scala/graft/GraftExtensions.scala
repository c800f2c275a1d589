package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session-extension entry point: registers graft's native Catalyst
  * expressions on every session built with it, so SQL users get them
  * without imperative registration:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * (Programmatic users can still call `GraftFunctions.register` on an
  * existing session — both paths install the same builders.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => graft.functions.GraftFunctions.build(children)))
    // Fuse the declarative aggregate(zip_with(·,·,*),0.0,+) idiom into
    // the codegen kernel on every query (see graft.plans.FuseDotProduct).
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
  }
}
