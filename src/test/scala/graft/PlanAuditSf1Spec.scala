package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The PlanAuditSpec trap pins re-asserted at sf1 (VERDICT r9 #7): AQE
  * choices are SCALE-DEPENDENT — a side that broadcasts at the 6 MB
  * fixture can cross the broadcast threshold at 10× and flip the join
  * strategy, so a pin that only ever sees sf0.001 cannot catch a trap
  * that exists only at scale (the r9 ×10 addendum observed exactly such
  * broadcast flips on the TPC-H tier). The sf1-equivalent fixture is
  * MINTED once per machine (graft.tools.MintSf, ×10 of sf0.1,
  * key-shifted copies — join fanouts exactly the base's) and cached
  * under /tmp; the three classic trap queries then run TO COMPLETION at
  * sf1 and their FINAL adaptive plans are pinned.
  *
  * Runtime cost: one ~60 s mint on first run (cached after), plus three
  * sf1 query executions (~15 s) — the price of pinning post-AQE plans,
  * which only exist after execution. */
class PlanAuditSf1Spec extends SparkSpec {

  private lazy val sf1Dir: String = {
    val out = "/tmp/graft_sf1_planaudit"
    val marker = new java.io.File(s"$out/_MINTED")
    if (!marker.exists()) {
      // A partial mint (crashed run) would fail errorifexists — clear it.
      val root = new java.io.File(out)
      if (root.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(root)
      }
      graft.tools.MintSf.mint(spark, SparkSpec.Sf01, out, 10)
      marker.createNewFile()
    }
    out
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def count(plan: String, re: String): Int =
    re.r.findAllIn(plan).size
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf1Dir)

  test("sf1: Q19's disjunctive predicate still plans a hash join (no BNLJ/cartesian)") {
    val p19 = finalPlan(q("q_tpch_q19"))
    assert(!p19.contains("BroadcastNestedLoopJoin") &&
      !p19.contains("CartesianProduct"),
      s"q_tpch_q19 fell off the hash join at sf1:\n$p19")
    assert(count(p19, "Join") >= 1, s"q_tpch_q19 at sf1:\n$p19")
  }

  test("sf1: Q16's blacklist anti join survives on the logical plan") {
    // Logical, not physical: AQE deletes an anti join whose build side
    // is provably empty — at sf1 the blacklist is non-empty, but the
    // LOGICAL pin is the invariant stated scale-independently.
    val df16 = q("q_tpch_q16")
    val l16 = df16.queryExecution.optimizedPlan.toString
    assert(l16.contains("LeftAnti"),
      s"q_tpch_q16 lost its anti join at sf1:\n$l16")
    val p16 = finalPlan(df16)
    assert(!p16.contains("BroadcastNestedLoopJoin") &&
      !p16.contains("CartesianProduct"),
      s"q_tpch_q16 planned a nested loop at sf1:\n$p16")
  }

  test("sf1: Q21 keeps the one-aggregate decorrelation and heap top-k") {
    val p21 = finalPlan(q("q_tpch_q21"))
    assert(p21.contains("TakeOrderedAndProject"),
      s"q_tpch_q21 lost its top-k heaps at sf1:\n$p21")
    assert(count(p21, "Exchange rangepartitioning") == 0,
      s"q_tpch_q21 grew a global sort at sf1:\n$p21")
    assert(count(p21, "Scan parquet [^\\n]*lineitem") <= 2,
      s"q_tpch_q21 scans lineitem more than its two passes at sf1:\n$p21")
    assert(!p21.contains("BroadcastNestedLoopJoin") &&
      !p21.contains("CartesianProduct"),
      s"q_tpch_q21 planned a nested loop at sf1:\n$p21")
  }

  test("sf1: content SERVE path keeps its partition pruning above the " +
      "broadcast threshold (r16, VERDICT r15 #7)") {
    // The r15 fixture-scale pins (PlanAuditSpec) can miss an AQE flip
    // that only exists once the index outgrows the 10 MB broadcast
    // threshold — the exact class the TPC-H ×10 addendum caught. Same
    // assertions, ×10 data: candidates prune to the probes' sb
    // buckets, the verify prunes the docstore to the candidates' db
    // buckets, and NEITHER tier ever scans the corpus or re-explodes
    // shingles at serve time.
    import graft.operators.{ContentIndex, Takedown, TextOps}
    import org.apache.spark.sql.functions.{col, concat_ws, lit, slice}
    val idx = s"${tmpDir("sf1_content_idx")}/idx"
    ContentIndex.buildBatch(spark,
      Tables.documents(spark, sf1Dir), idx, 0L)
    val passages = Tables.documents(spark, sf1Dir)
      .where(col("doc_id") === 8L)
      .select(lit(0L).as("passage_id"),
        concat_ws(" ",
          slice(TextOps.tokens(col("text")), 2, 5)).as("passage"))
    val pc = finalPlan(Takedown.servedCandidates(spark, idx, passages))
    assert(!pc.contains("documents.parquet"),
      s"sf1 candidate tier scanned the corpus:\n$pc")
    assert(!pc.contains("Generate"),
      s"sf1 candidate tier re-exploded shingles at serve:\n$pc")
    assert("PartitionFilters: \\[[^\\]]*sb".r.findFirstIn(pc).nonEmpty,
      s"sf1 shingle scan lost its bucket partition filter:\n$pc")
    val p = finalPlan(Takedown.servedExact(spark, idx, passages))
    assert(!p.contains("documents.parquet"),
      s"sf1 served content resolution scanned the corpus:\n$p")
    assert(!p.contains("Generate"),
      s"sf1 served content resolution re-exploded shingles:\n$p")
    assert("PartitionFilters: \\[[^\\]]*db".r.findFirstIn(p).nonEmpty,
      s"sf1 docstore scan lost its doc-bucket partition filter:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"sf1 served verify planned a nested loop:\n$p")
  }

  test("sf1: the certificate's scoped pack leg reads standing tables " +
      "only — no corpus scan, no nested loop (r16, VERDICT r15 #7)") {
    // The r16 invariant stated at scale: packCertLeg consumes the
    // STANDING (doc_id, lang, n_tokens) counts and pack tables; a
    // plan that reaches back to documents.parquet is re-tokenizing
    // the corpus per audit — the exact fixed cost VERDICT r15 #4
    // removed. Staged like the fixture stages them (one tokenize),
    // then audited as parquet reads. Late one-lang cut so the
    // suffix-scoped branch (the production form) is the one pinned.
    import graft.operators.{Sampling, Takedown}
    import org.apache.spark.sql.functions.{col, max}
    val dir = tmpDir("sf1_packcert")
    val docs = Tables.documents(spark, sf1Dir)
    val counts0 = Sampling.tokenCountsOf(docs).localCheckpoint()
    counts0.write.parquet(s"$dir/counts")
    Sampling.packSequencesOfCounts(counts0).write.parquet(s"$dir/packs")
    val counts = spark.read.parquet(s"$dir/counts")
    val packs = spark.read.parquet(s"$dir/packs")
    val lang0 = counts.select(col("lang")).orderBy(col("lang")).limit(1)
      .collect()(0).getString(0)
    val lastDoc = counts.where(col("lang") === lang0)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val dead = counts.where(col("doc_id") === lastDoc)
      .select(col("doc_id")).localCheckpoint()
    val leg = Takedown.packCertLeg(counts, dead, packs,
      suffixScoped = true)
    val r = leg.collect()(0)
    assert(r.getLong(2) == 0L,
      s"clean sf1 pack table certified corrupt: n_dead=${r.getLong(2)}")
    val p = finalPlan(leg)
    assert(!p.contains("documents.parquet"),
      s"sf1 pack leg re-tokenized the corpus:\n$p")
    // The leg ENDS in a deliberate 1x1 crossJoin of two one-row
    // aggregates (n_live x n_dead — the one-row-totals pattern), which
    // plans as a bounded BroadcastNestedLoopJoin; anything beyond that
    // single bounded cross is a real nested loop.
    assert(count(p, "BroadcastNestedLoopJoin") <= 1 &&
      !p.contains("CartesianProduct"),
      s"sf1 pack leg planned an unexpected nested loop:\n$p")
  }
}
