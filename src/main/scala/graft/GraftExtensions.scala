package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, FreqItemsAgg, RollingHash, TopKAgg}

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
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_rolling_hash requires exactly 1 argument, got ${children.length}")
        RollingHash(children.head)
      }))
    // Aggregates: the analyzer wraps a returned AggregateFunction in
    // its AggregateExpression, so SQL `graft_top_k(score, id, 3)` and
    // `graft_freq_items(tok, 64)` work in GROUP BY queries directly.
    ext.injectFunction((
      FunctionIdentifier("graft_token_window_hash"),
      new ExpressionInfo(classOf[graft.functions.TokenWindowHash].getName,
        "graft_token_window_hash"),
      (children: Seq[Expression]) =>
        graft.functions.TokenWindowHash.build(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_top_k"),
      (children: Seq[Expression]) => TopKAgg.build(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FreqItemsAgg].getName, "graft_freq_items"),
      (children: Seq[Expression]) => FreqItemsAgg.build(children)))
    // Fuse the declarative aggregate(zip_with(·,·,*),0.0,+) idiom into
    // the codegen kernel on every query (see graft.plans.FuseDotProduct).
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
  }

}
