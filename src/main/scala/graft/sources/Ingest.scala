package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-layer ingest readers — reference parity for S1-S5 (SURVEY §2.1).
  *
  * The reference loads CSV-with-header (local flow) and headerless TSV
  * (global/Dataproc flow) into BigQuery raw tables with deliberately
  * all-STRING schemas (`cloud_composer/datapipeline_gcp.py:230-235,
  * 247-252`; `:377-385` adds one INTEGER), casting late in SQL. The
  * raw→master boundary here does the same: schema-on-read strings, then
  * explicit null-tolerant casts (`to_timestamp` yields null on malformed
  * input instead of aborting a WRITE_APPEND pipeline — SURVEY §7.4.1).
  */
object Ingest {

  /** r_campaigns: campaign_id, cost, country, date_time — all STRING
    * (datapipeline_gcp.py:230-235). */
  val campaignsSchema: StructType = StructType(Seq(
    StructField("campaign_id", StringType),
    StructField("cost", StringType),
    StructField("country", StringType),
    StructField("date_time", StringType)))

  /** r_transactions: transaction_id, income, country, date_time — all
    * STRING (datapipeline_gcp.py:247-252). */
  val transactionsSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("income", StringType),
    StructField("country", StringType),
    StructField("date_time", StringType)))

  /** r_sales: all STRING except quantity INTEGER
    * (datapipeline_gcp.py:377-385). */
  val salesSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("customer_id", StringType),
    StructField("product_id", StringType),
    StructField("quantity", IntegerType),
    StructField("price", StringType),
    StructField("category", StringType),
    StructField("date_time", StringType)))

  /** S1/S2/S4: glob-read CSV with a header row, fixed raw schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S3: headerless CSV (the Cloud-SQL-export flow skips no rows). */
  def readCsvNoHeader(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read.schema(schema).csv(path)

  /** S5: headerless tab-delimited TXT (`create_campaigns/txt/main.py:30`
    * record shape `id\tcost\tcountry\tdatetime`). */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("sep", "\t").csv(path)

  /** Malformed-row-capturing CSV reader: PERMISSIVE parse with the raw
    * line preserved in `_corrupt_record` — the ingest twin of the DQ
    * quarantine. A crooked row never aborts a 1000-file load (FAILFAST
    * would) and never silently vanishes (DROPMALFORMED would); it lands
    * typed-null with its original text, ready for
    * [[graft.operators.Curation.expectSplit]]-style routing. Note
    * Spark's lazy-parse caveat: selecting ONLY `_corrupt_record`
    * requires a cache or a wider projection; downstream gates read data
    * columns too, which satisfies it. */
  def readCsvPermissive(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** JSONL ingest (north-star extension: LLM corpora overwhelmingly ship
    * as JSON Lines, usually gzipped). Explicit schema — schema inference
    * over 100 TB is a full extra pass. Spark decompresses by file
    * extension transparently; note gzip is NOT splittable (one task per
    * .gz object — corpora should be sharded into many files, which they
    * are in practice; zstd/bzip2 split). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC ingest: the other columnar lake format Spark reads natively —
    * vectorized reader, predicate pushdown and column pruning work the
    * same as parquet, so a mixed parquet/ORC lake needs no special
    * handling. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** S6: live JDBC scan of an operational database — the reference's
    * Cloud SQL export step (`cloud_composer/datapipeline_gcp.py:33-36,
    * 85-93,355-360`) runs `SELECT *` against MySQL before staging to
    * GCS; this is the direct-read equivalent. Partitioned read: Spark
    * issues `numPartitions` range-predicated queries
    * (`WHERE col >= lo AND col < hi`) in parallel, so an operational
    * table streams in on N connections instead of one — the only JDBC
    * shape that scales (a single-connection read serializes the whole
    * table through one task). Bounds outside [lower, upper] still land
    * in the first/last stride, so approximate bounds are safe. Filters
    * and column pruning push down into the generated SQL
    * (`PushedFilters` in the scan node), exactly like parquet. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int,
               properties: java.util.Properties = new java.util.Properties())
      : DataFrame =
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, properties)

  /** [[readJdbc]] with the partition bounds discovered from the source
    * itself (VERDICT r5 ask #8): one single-row MIN/MAX pushed down to
    * the database — an index-range probe there, never a table scan of
    * consequence — so callers don't hand-maintain bound literals that
    * drift as the operational table grows. Bounds only SHAPE the strides
    * (Spark's first/last partitions are open-ended), so a row arriving
    * between the probe and the read is still ingested; skew in the key
    * space degrades balance, not correctness. Fails fast on an empty
    * table (no bounds ⇒ nothing to partition). */
  def readJdbcAutoBounds(spark: SparkSession, url: String, table: String,
                         partitionColumn: String, numPartitions: Int,
                         properties: java.util.Properties =
                           new java.util.Properties()): DataFrame = {
    // Quote the COLUMN through the url's JDBC dialect: Spark's writer
    // creates quoted (case-exact) column identifiers, so an unquoted
    // probe would get case-folded by the database and miss it. The
    // TABLE is deliberately NOT quoted — it must resolve exactly as
    // the unquoted `dbtable` the paired readJdbc/writer used (quoting
    // here would flip case-folding semantics and miss tables created
    // unquoted) — but it IS validated against an identifier pattern
    // (ADVICE r6): raw interpolation into the probe SQL was an
    // injection hazard for non-literal callers. Plain or
    // schema-qualified names pass; anything else (spaces, quotes,
    // parens) fails fast with a pointer to readJdbc, whose dbtable
    // option accepts arbitrary subqueries WITHOUT string-building SQL
    // here.
    require(table.matches("""[A-Za-z0-9_$.]+"""),
      s"readJdbcAutoBounds interpolates the table name into a probe " +
        s"query and accepts only plain/schema-qualified identifiers; " +
        s"got '$table' — probe bounds yourself and call readJdbc")
    val qc = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(partitionColumn)
    val probe = spark.read.jdbc(url,
      s"(SELECT MIN($qc) AS mn, MAX($qc) AS mx " +
        s"FROM $table) AS bounds", properties).collect()(0)
    require(!probe.isNullAt(0) && !probe.isNullAt(1),
      s"$table is empty or $partitionColumn all-null: no partition bounds")
    // Through Number, not getLong: the database maps the key column to
    // whatever integral type it likes (INTEGER, DECIMAL(p,0), BIGINT) —
    // bounds only shape strides, so narrowing to Long is always safe.
    def bound(i: Int): Long = probe.get(i) match {
      case n: Number => n.longValue
      case other => throw new IllegalArgumentException(
        s"$partitionColumn bound is non-numeric: $other")
    }
    readJdbc(spark, url, table, partitionColumn,
      bound(0), bound(1), numPartitions, properties)
  }

  /** Raw→master normalization for transaction-shaped frames: F3/F4 casts
    * (string → double / timestamp), null-tolerant via try_* so a malformed
    * row nulls out instead of aborting a WRITE_APPEND pipeline (SURVEY
    * §7.4.1 — Spark 4 runs ANSI mode by default, where a plain cast
    * throws). */
  def normalizeTransactions(raw: DataFrame): DataFrame =
    raw.select(
      col("transaction_id"),
      expr("try_cast(income AS DOUBLE)").as("income"),
      col("country"),
      try_to_timestamp(col("date_time"), lit("yyyy-MM-dd HH:mm:ss"))
        .as("date_time"))

  /** Data-quality report for the raw→master boundary (SURVEY §7.4.1:
    * null-tolerant casts MUST be paired with a count-of-nulls check so a
    * silently-nulling feed is caught): per column, how many nulls the
    * normalization introduced (null after cast, non-null raw). One
    * aggregate pass; at scale this is the cheap guard that replaces
    * ANSI-mode aborts. */
  def castQualityReport(raw: DataFrame, normalized: DataFrame,
                        key: String): DataFrame = {
    val cols = normalized.columns.filterNot(_ == key)
    val n = normalized.columns.map(c => col(c).as(s"n_$c"))
    val r = raw.columns.map(c => col(c).as(s"r_$c"))
    val joined = raw.select(r: _*)
      .join(normalized.select(n: _*), col(s"r_$key") === col(s"n_$key"))
    val exprs = count(lit(1)).as("rows") +: cols.map(c =>
      sum(when(col(s"n_$c").isNull && col(s"r_$c").isNotNull, 1)
        .otherwise(0)).as(s"nulled_$c"))
    joined.agg(exprs.head, exprs.tail: _*)
  }

  /** F1/F2 derivations the reference adds on top of the raw datetime
    * string (`load_campaigns_csv.py:11-12`): date part via SUBSTR and the
    * PARSE_TIME analog (Spark has no TIME type, so time-of-day stays a
    * normalized 'HH:mm:ss' string — documented deviation, SURVEY §7.4.4). */
  def withDateParts(df: DataFrame, dateTimeStr: Column): DataFrame =
    df.withColumn("date", substring(dateTimeStr, 1, 10))
      .withColumn("time", substring(dateTimeStr, 12, 8))

  /** F7 filename routing (`messaging/consumer/main.py:51-58`): derive
    * (table, extension, dag id) from a landed object path like
    * `ingested/csv/campaigns_20230706_ad17.csv`. */
  def routeFilename(path: Column): (Column, Column, Column) = {
    val base = element_at(split(path, "/"), -1)
    val table = element_at(split(base, "_"), 1)
    val ext = lower(element_at(split(base, "\\."), -1))
    (table, ext, concat(lit("load_"), table, lit("_"), ext))
  }

  /** S7 batch analog of the file-existence sensor: fail-fast check that
    * a glob matches at least one file before a load is attempted. */
  def filesExist(spark: SparkSession, glob: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(path)
    st != null && st.nonEmpty
  }
}
