package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table readers (see /root/repo/TESTDATA.md, FIXTURES.md).
  *
  * Plain parquet scans: Catalyst provides column pruning and predicate
  * pushdown for free, so every downstream operator should see
  * `PushedFilters`/`ReadSchema` reach these scans in `.explain`.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** Explicit read schema for events.parquet: `ts` is parquet
    * TIMESTAMP(NANOS), which Spark has no native type for. Supplying
    * LongType here makes the vectorized reader hand back the raw
    * nanosecond longs without the session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` flag (ADVICE r2: the flag
    * leaked into every later parquet read in the session). */
  private val eventsRawSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(eventsRawSchema).parquet(s"$d/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
