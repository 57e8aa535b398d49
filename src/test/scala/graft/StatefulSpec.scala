package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Stateful

/** Custom stateful streaming (mapGroupsWithState) and partition pruning
  * of the materialized master layer. */
class StatefulSpec extends SparkSpec {

  test("mapGroupsWithState: drained running totals == batch aggregate") {
    val dir = tmpDir("stateful")
    val events = Tables.events(spark, sf0001)
    events.write.parquet(s"$dir/events")
    val q = Stateful.runningUserTotals(spark, s"$dir/events", events.schema)
      .writeStream
      .format("memory").queryName("user_totals")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("user_totals")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        round(max(col("total_value")), 2).as("total_value"))
    val expect = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("sliding windows: every event lands in exactly two 2h/1h windows") {
    val events = Tables.events(spark, sf0001)
    val total = events.count()
    val windowed = graft.operators.Events.slidingWindows(spark, sf0001)
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(windowed == 2 * total)
  }

  test("master layer partitioned by country prunes partition directories") {
    val dir = tmpDir("partmaster")
    graft.sinks.Sinks.createTableAs(
      graft.operators.Relational.masterModel(spark, sf0001),
      s"$dir/m_data_model", partitionBy = Seq("transaction_country"))
    val one = spark.read.parquet(s"$dir/m_data_model")
      .where(col("transaction_country") === "NATION_3")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("transaction_country"))
    // pruned read returns only that country, and the full read has all
    val all = spark.read.parquet(s"$dir/m_data_model")
    assert(one.select(countDistinct(col("transaction_country"))).head().getLong(0) <= 1)
    assert(all.count() > one.count() && one.count() > 0)
  }
}
