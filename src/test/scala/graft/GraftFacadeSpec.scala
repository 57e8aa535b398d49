package graft

import org.apache.spark.sql.functions._

/** SQL facade: the registered views answer plain SQL with the same
  * results as the DataFrame API. */
class GraftFacadeSpec extends SparkSpec {

  test("install wires functions + rewrite + views in one call") {
    Graft.install(spark, sf0001)
    try {
      // Native SQL functions are usable against a registered view.
      val d = spark.sql(
        """SELECT vec_id,
          |       dot_d(transform(embedding, x -> CAST(x AS DOUBLE)),
          |             transform(embedding, x -> CAST(x AS DOUBLE))) AS sq
          |FROM embeddings LIMIT 5""".stripMargin)
      assert(d.count() == 5 && d.where(col("sq") < 0).isEmpty)
      assert(spark.sql("SELECT hamming(5, 6)").head().getInt(0) == 2)
    } finally GraftExtensions.uninstall(spark)
  }

  test("registered views answer SQL equal to the DataFrame API") {
    Graft.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT transaction_country AS country,
        |       ROUND(SUM(income), 2) AS income
        |FROM m_data_model
        |GROUP BY 1""".stripMargin)
    val viaApi = graft.operators.Relational.masterModel(spark, sf0001)
      .groupBy(col("transaction_country").as("country"))
      .agg(round(sum(col("income")), 2).as("income"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    // business view answers directly
    assert(spark.sql("SELECT * FROM b_sales_kpi").count() > 0)
    // raw + LLM tables are addressable
    assert(spark.sql(
      "SELECT count(*) FROM r_transactions").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM documents WHERE lang = 'en'").head().getLong(0) > 0)
  }
}
