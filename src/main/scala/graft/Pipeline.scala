package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational
import graft.sources.{Generator, Ingest}
import graft.sinks.Sinks

/** E1: the flagship batch pipeline driver — the engine twin of the
  * `datapipeline_gcp` DAG (`cloud_composer/datapipeline_gcp.py:449-451`):
  *
  *   generate → stage CSV → sense → load raw (append) → archive
  *            → master (materialized ONCE) → business aggregates.
  *
  * The master frame is written to the master layer and re-read before the
  * business queries — the reference's shape exactly (BigQuery materializes
  * `m_data_model`, business queries scan the table), and the at-scale fix
  * for computing the expensive join DAG once instead of once per
  * consumer (VERDICT r1 #7).
  *
  * Every stage runs as a named [[Steps.step]] under the DAG-level retry
  * policy (reference `DEFAULT_ARGS`, `datapipeline_gcp.py:38-44`) and its
  * wall time is recorded — [[runReport]] returns the per-stage breakdown
  * the macro bench and PLANS.md read. Steps are cut at retry-idempotent
  * grains: appends publish via Spark's commit protocol (a failed attempt
  * commits nothing), archival renames stop matching the glob once moved.
  */
object Pipeline {

  case class LayerCounts(raw: Map[String, Long], master: Long,
                         business: Map[String, Long])

  case class StageTiming(stage: String, seconds: Double)

  case class RunReport(counts: LayerCounts, stages: Seq[StageTiming])

  def run(spark: SparkSession, sfDir: String, outDir: String,
          genRows: Long = 1000): LayerCounts =
    runReport(spark, sfDir, outDir, genRows).counts

  def runReport(spark: SparkSession, sfDir: String, outDir: String,
                genRows: Long = 1000,
                policy: Steps.Policy = Steps.Policy()): RunReport = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageTiming]
    def step[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = Steps.step(name, policy)(body)
      stages.synchronized {
        stages += StageTiming(name, (System.nanoTime() - t0) / 1e9)
      }
      r
    }
    // The reference DAG fans independent tasks out in parallel
    // (`datapipeline_gcp.py:449` `[api_local, api_global, database_sql]`,
    // `:273` `[load_campaign, load_transaction]`); sequential actions here
    // left scheduler/IO gaps idle (r9 E1 profile: the 5 business consumers
    // alone cost 7.2 s serial at sf0.1). Concurrent action submission is
    // the Spark twin of that fan-out — jobs interleave as task slots free
    // up. Failures propagate: the first failed branch rethrows after all
    // branches settle (never abandoning an in-flight sibling write).
    def inParallel[T](thunks: Seq[() => T]): Seq[T] = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fs = thunks.map(t => Future(t()))
      // Settle every branch before surfacing the first failure.
      fs.map(f => Await.ready(f, Duration.Inf))
      fs.map(f => Await.result(f, Duration.Inf))
    }

    val ingested = s"$outDir/ingested/csv"
    val loaded = s"$outDir/loaded/csv"

    // 1. Generate (S9) + stage as CSV objects (K4), one dir per table —
    // the two tables in parallel (overwrite staging writes: a step retry
    // restarts both idempotently, so one step owns the pair).
    step("generate_stage") {
      inParallel(Seq(
        () => Sinks.writeCsvObjects(Generator.campaigns(spark, genRows),
          s"$ingested/campaigns"),
        () => Sinks.writeCsvObjects(Generator.transactions(spark, genRows),
          s"$ingested/transactions")))
    }

    // 2. Sense (S7 batch analog): fail fast if staging is empty.
    step("sense") {
      require(Ingest.filesExist(spark, s"$ingested/campaigns/*.csv"),
        "no staged campaign files")
      require(Ingest.filesExist(spark, s"$ingested/transactions/*.csv"),
        "no staged transaction files")
    }

    // 3. Load raw (S1/S2 + K1): schema-on-read strings, append; then
    // archive (K5) as its OWN step — a retry of the move alone is
    // idempotent, grouping it with the append would re-append on a
    // move-only failure.
    step("load_raw") {
      val rawCampaigns = Ingest.readCsv(spark, s"$ingested/campaigns/*.csv",
        Ingest.campaignsSchema)
      Sinks.appendLayer(rawCampaigns, s"$outDir/raw_layer/r_campaigns")
      val rawTransactions = Ingest.readCsv(spark,
        s"$ingested/transactions/*.csv", Ingest.transactionsSchema)
      Sinks.appendLayer(rawTransactions, s"$outDir/raw_layer/r_transactions")
    }
    step("archive") {
      Sinks.archive(spark, s"$ingested/campaigns/*.csv", s"$loaded/campaigns")
      Sinks.archive(spark, s"$ingested/transactions/*.csv",
        s"$loaded/transactions")
    }

    // Stages 4-8 form TWO independent DAG arms — the warehouse arm
    // (master → business, over the TPC-H tables) and the corpus arm
    // (dq_gate → curation → assembly, over documents) share no inputs or
    // outputs — so they run CONCURRENTLY, the Spark twin of the
    // reference's parallel task groups. Each arm stays sequential inside
    // (real data dependencies); r9 E1 profile: arm-parallelism cut the
    // sf0.1 wall from 18.9 s (fully serial) toward the critical path.
    val masterPath = s"$outDir/master_layer/m_data_model"
    var master: DataFrame = null
    var business: Map[String, DataFrame] = Map.empty

    def warehouseArm(): Unit = {
      // 4. Master: materialize m_data_model ONCE (K3-style create),
      // partitioned by country so per-country consumers prune partitions.
      master = step("master") {
        Sinks.createTableAs(Relational.masterModel(spark, sfDir), masterPath,
          partitionBy = Seq("transaction_country"))
        spark.read.parquet(masterPath)
      }
      // 5. Business layer: five aggregates over the materialized master,
      // submitted CONCURRENTLY — each consumer is its OWN retry step (the
      // Airflow model: per-task retries), because a block-level retry
      // after one consumer's failure would re-append its already-committed
      // siblings. A single consumer's append retry is safe: Spark's
      // commit protocol publishes files only on job success.
      business = Map(
        "b_performance_metrics" -> Relational.performanceMetrics(master),
        "b_product_performance" -> Relational.productPerformance(master),
        "b_profitability_kpi" -> Relational.profitabilityKpi(master),
        "b_sales_kpi" -> Relational.salesKpi(master),
        "b_customer_retention" -> Relational.customerRetention(master))
      inParallel(business.toSeq.map { case (name, df) => () =>
        step(s"business_$name") {
          Sinks.appendLayer(df, s"$outDir/business_layer/$name")
        }
      })
    }

    def corpusArm(): Unit = {
      // 6. Data-quality gate between ingest and the LLM tier: rows
      // violating the documents contract are quarantined (never silently
      // dropped), the rule-level report lands beside them, and the gated
      // corpus is MATERIALIZED as its own layer so curation genuinely
      // runs on good rows only — filtering curation's output instead
      // would let a quarantined near-dup knock its DQ-passing twin out
      // of the corpus.
      val gatedDir = s"$outDir/dq_layer/gated"
      step("dq_gate") {
        val (goodDocs, badDocs) = graft.operators.Curation.expectSplit(
          Tables.documents(spark, sfDir),
          graft.operators.Curation.documentRules)
        Sinks.appendLayer(badDocs, s"$outDir/dq_layer/quarantine_documents")
        Sinks.appendLayer(graft.operators.Curation.dqReport(spark, sfDir),
          s"$outDir/dq_layer/dq_report")
        goodDocs.write.mode("overwrite").parquet(s"$gatedDir/documents.parquet")
      }
      // 7. LLM-tier curation over the gated layer: quality-gated,
      // near-dup-free corpus beside the business layer (the
      // training-data consumer's table).
      step("curation") {
        Sinks.appendLayer(
          graft.operators.Curation.curatedDocs(spark, gatedDir),
          s"$outDir/curated_layer/c_documents")
      }
      // 8. Corpus assembly over the curated survivors: hash-stable
      // train/val/test assignment (partitioned by split so a trainer
      // reads only its slice) and the token-budget pack manifest — the
      // last two steps between "curated corpus" and "training batches".
      step("assembly") {
        val survivors = spark.read
          .parquet(s"$outDir/curated_layer/c_documents").select("doc_id")
        Sinks.createTableAs(
          graft.operators.Sampling.trainSplit(spark, sfDir)
            .join(survivors, "doc_id"),
          s"$outDir/assembly_layer/a_split", partitionBy = Seq("split"))
        Sinks.createTableAs(
          graft.operators.Sampling.packSequencesOf(
            Tables.documents(spark, sfDir).join(survivors, "doc_id")),
          s"$outDir/assembly_layer/a_packs")
      }
    }

    inParallel(Seq(() => warehouseArm(), () => corpusArm()))

    val counts = step("layer_counts") {
      // Read-only bookkeeping scans — all submitted concurrently.
      val rawNames = Seq("r_campaigns", "r_transactions")
      val bizNames = business.keys.toSeq
      val cs = inParallel(
        rawNames.map(n => () =>
          spark.read.parquet(s"$outDir/raw_layer/$n").count()) ++
        Seq(() => master.count()) ++
        bizNames.map(n => () =>
          spark.read.parquet(s"$outDir/business_layer/$n").count()))
      LayerCounts(
        raw = rawNames.zip(cs.take(2)).toMap,
        master = cs(2),
        business = bizNames.zip(cs.drop(3)).toMap)
    }
    RunReport(counts, stages.toSeq)
  }
}
