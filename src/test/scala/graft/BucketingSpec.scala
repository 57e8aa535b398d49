package graft

import org.apache.spark.sql.functions._
import graft.sinks.Sinks
import graft.operators.Relational

/** Bucketed co-located joins and the approx-distinct scale swap-in. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    Sinks.writeBucketedTable(orders, "t_orders_b", 4, "o_custkey",
      sortKeys = Seq("o_custkey"))
    Sinks.writeBucketedTable(customer, "t_customer_b", 4, "c_custkey",
      sortKeys = Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("t_orders_b")
        .join(spark.table("t_customer_b"), $"o_custkey" === $"c_custkey")
      j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n$plan")
      val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
      assert(j.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_customer_b")
    }
  }

  test("approx_count_distinct tracks exact within 5%") {
    val r = Relational.approxDistinct(spark, sf0001)
    assert(r.count() > 0)
    assert(r.agg(max($"rel_err")).head().getDouble(0) < 0.05)
  }
}
