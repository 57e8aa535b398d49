package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.expressions.{BoundedCollectLong, DotProduct, HammingDistance, ShingleArray}
import graft.plans.RewriteDotProduct

/** Engine plug-in for Spark's extension points. Two ways in:
  *
  *  - at session build time (the deployment path):
  *    `--conf spark.sql.extensions=graft.GraftExtensions`
  *    or `SparkSession.builder().withExtensions(new GraftExtensions)`
  *  - on a live session (tests, notebooks):
  *    `GraftExtensions.install(spark)` — uses
  *    `spark.experimental.extraOptimizations` and the temp-function
  *    registry, idempotent.
  *
  * Installs the native expressions (`dot_d`, `hamming`) and the
  * [[graft.plans.RewriteDotProduct]] optimizer rule that transparently
  * upgrades HOF dot-product folds to the fused codegen loop.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_d"),
      DotProduct.builder))
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getCanonicalName, "hamming"),
      HammingDistance.builder))
    ext.injectFunction((
      FunctionIdentifier("bounded_collect_long"),
      new ExpressionInfo(classOf[BoundedCollectLong].getCanonicalName,
        "bounded_collect_long"),
      BoundedCollectLong.builder))
    ext.injectFunction((
      FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getCanonicalName,
        "shingle_array"),
      ShingleArray.builder))
  }
}

object GraftExtensions {
  /** Install on an already-running session (idempotent). */
  def install(spark: SparkSession): Unit = {
    DotProduct.register(spark)
    HammingDistance.register(spark)
    BoundedCollectLong.register(spark)
    ShingleArray.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
  }

  /** Remove the live-session optimizer hook (test hygiene). */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
}
