package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.connect.{Connectors, ParquetDirSink, ParquetDirSource, Sink, Source}
import graft.sinks.Sinks

/** The pluggable connector seam (VERDICT r8 #3): a foreign source/sink
  * registered under its locator scheme must receive every `Tables` read
  * and `Sinks` layer write for locators it owns — with zero edits to
  * operators — while plain paths keep resolving to the parquet built-ins.
  */
class ConnectorSpec extends SparkSpec {
  import spark.implicits._

  /** Records reads; serves canned frames keyed by table name. */
  private class MockSource extends Source {
    val reads = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def read(spark: SparkSession, dataset: String, table: String): DataFrame = {
      reads += ((dataset, table))
      table match {
        case "region" =>
          Seq((0L, "MOCKLAND")).toDF("r_regionkey", "r_name")
        case "events" =>
          Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), 7L))
            .toDF("event_id", "ts", "user_id")
        case other => fail(s"unexpected table read: $other")
      }
    }
  }

  /** Records writes instead of performing them. */
  private class MockSink extends Sink {
    val writes = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Seq[String])]
    def append(df: DataFrame, table: String): Unit =
      writes += (("append", table, df.count(), Nil))
    def create(df: DataFrame, table: String,
               partitionBy: Seq[String] = Nil): Unit =
      writes += (("create", table, df.count(), partitionBy))
    def overwritePartitions(df: DataFrame, table: String,
                            partitionBy: Seq[String]): Unit =
      writes += (("overwrite_partitions", table, df.count(), partitionBy))
  }

  test("scheme resolution: plain paths are file; URIs dispatch on scheme") {
    assert(Connectors.schemeOf("/root/testdata/sf0.01") == "file")
    assert(Connectors.schemeOf("relative/dir") == "file")
    assert(Connectors.schemeOf("jdbc:derby:memory:x") == "jdbc")
    assert(Connectors.schemeOf("mock://warehouse/a") == "mock")
    assert(Connectors.schemeOf("BQ://proj.ds") == "bq")
    assert(Connectors.source("/root/testdata/sf0.001") eq ParquetDirSource)
    assert(Connectors.sink("/tmp/anything") eq ParquetDirSink)
    assert(Connectors.source("jdbc:derby:memory:x")
      .isInstanceOf[graft.connect.JdbcSource])
  }

  test("Tables routes reads through a registered source, operators unchanged") {
    val src = new MockSource
    Connectors.registerSource("mock", src)
    val region = Tables.region(spark, "mock://corpus")
    assert(region.collect().map(_.getString(1)).toSeq == Seq("MOCKLAND"))
    // events: foreign connectors bypass the parquet fixture ts shims and
    // are read verbatim — the connector owns its own type mapping.
    val ev = Tables.events(spark, "mock://corpus")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() == 1)
    assert(src.reads.toList ==
      List(("mock://corpus", "region"), ("mock://corpus", "events")))
  }

  test("Sinks routes layer writes through a registered sink") {
    val snk = new MockSink
    Connectors.registerSink("mock", snk)
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Sinks.appendLayer(df, "mock://wh/raw_layer/r_t")
    Sinks.createTableAs(df, "mock://wh/master_layer/m_t", Seq("v"))
    Sinks.overwritePartitions(df, "mock://wh/dated/m_d", Seq("v"))
    assert(snk.writes.toList == List(
      ("append", "mock://wh/raw_layer/r_t", 2L, Nil),
      ("create", "mock://wh/master_layer/m_t", 2L, Seq("v")),
      ("overwrite_partitions", "mock://wh/dated/m_d", 2L, Seq("v"))))
  }

  test("unregistered scheme fails fast with the registry listing") {
    val e = intercept[IllegalArgumentException] {
      Connectors.source("nosuch://x").read(spark, "nosuch://x", "t")
    }
    assert(e.getMessage.contains("nosuch") &&
      e.getMessage.contains("registerSource"))
    val e2 = intercept[IllegalArgumentException] {
      Connectors.sink("nosink://x")
    }
    assert(e2.getMessage.contains("registerSink"))
  }

  test("create is retry-idempotent over commit debris, still protects data") {
    val dir = tmpDir("ctas")
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    // Simulate a failed first attempt: target exists holding only
    // commit-protocol debris (_temporary scratch), no committed files.
    val target = new java.io.File(s"$dir/t.parquet")
    val scratch = new java.io.File(target, "_temporary/0/task_000")
    assert(scratch.mkdirs())
    java.nio.file.Files.write(new java.io.File(scratch, "part-0").toPath,
      "partial".getBytes)
    Sinks.createTableAs(df, target.toString) // retry: must succeed
    assert(Tables.read(spark, dir, "t").count() == 2)
    // A target holding COMMITTED data still fails — that's the contract.
    intercept[Exception] { Sinks.createTableAs(df, target.toString) }
    assert(Tables.read(spark, dir, "t").count() == 2) // untouched
  }

  test("parquet default round-trips through the seam end to end") {
    val dir = tmpDir("seam")
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    Sinks.appendLayer(df, s"$dir/t.parquet")
    val back = Tables.read(spark, dir, "t")
    assert(back.collect().toSet == df.collect().toSet)
  }
}
