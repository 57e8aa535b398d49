package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Automated plan-shape regression guards: the invariants PLANS.md
  * documents per round, pinned so a refactor that silently doubles a
  * scan or adds a shuffle fails CI instead of surfacing at 100 TB.
  * Counts run against the FINAL adaptive plan (post-AQE). */
class PlanAuditSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    // collect() drives THIS Dataset's QueryExecution (count() would
    // build and run a separate groupBy().count() plan, leaving this
    // one un-executed and the adaptive plan at its initial state).
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def count(plan: String, re: String): Int =
    re.r.findAllIn(plan).size
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  test("master model: window-free, cost agg broadcast back onto the fact") {
    // VERDICT r5 fix #1 (§8.7): campaign_cost must come from the compact
    // (nation, country, month) aggregate broadcast back — NEVER a window
    // over the raw fact (AQE can skew-split a join but never a window
    // exchange, and the window shuffled the whole fact). Ad-hoc plan cost:
    // the orders⨝customer⨝nation subtree is planned twice (agg input +
    // fact side) = 8 scans; the E1 standing pipeline passes a persisted
    // txn frame, which collapses that back to one pass.
    val p = finalPlan(q("q_master_model"))
    assert(!p.contains("Window"),
      s"master model reintroduced a window over the raw fact:\n$p")
    assert(count(p, "Scan parquet") <= 8,
      s"master scan budget blown (expect ≤ 2× its 5 source tables):\n$p")
    assert(count(p, "BroadcastHashJoin") >= 4,
      s"cost join-back (and dims) should broadcast:\n$p")
  }

  test("rollup: one GROUPING SETS pass — no table scanned twice") {
    val p = finalPlan(q("q_rollup"))
    assert(count(p, "Scan parquet") == 3)
    assert(count(p, "Expand") >= 1) // the multi-grain Expand, not dual aggs
  }

  test("map-only pipelines stay shuffle-free") {
    Seq("q_chunk", "q_fingerprint", "q_token_count", "q_train_split",
      "q_stratified_sample", "q_multimodal_meta", "q_pii_redact",
      // r8 additions: decode sweeps and per-row curation gates
      "q_audio_stats", "q_mixed_modality", "q_pii_card",
      "q_intradoc_dedup")
      .foreach { name =>
        val p = finalPlan(q(name))
        assert(count(p, "Exchange (hash|range)") == 0,
          s"$name grew a shuffle:\n$p")
      }
  }

  test("TPC-H classics keep their documented exchange budget (r8)") {
    // Q1: partial agg → ONE exchange on 6 groups → final agg, filter
    // pushed to the scan.
    val p1 = finalPlan(q("q_tpch_q1"))
    assert(count(p1, "Exchange (hash|range)") == 1, s"q_tpch_q1:\n$p1")
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q_tpch_q1 shipdate filter not pushed:\n$p1")
    // CMS: the d·w counter key space is corpus-size independent; the
    // only hash exchanges are the counter build and the vocab-grain
    // estimate/exact aggregates (≤ 3), and the estimation join rides a
    // broadcast, never a shuffle of the corpus.
    val pc = finalPlan(q("q_cms_heavy_hitters"))
    assert(count(pc, "Exchange hash") <= 3 &&
      count(pc, "BroadcastHashJoin") >= 1, s"q_cms_heavy_hitters:\n$pc")
    // Q4: the EXISTS stays a SEMI join (never rewritten to inner +
    // distinct — the duplicate trap the operator exists to avoid).
    val p4 = finalPlan(q("q_tpch_q4"))
    assert(p4.contains("LeftSemi"), s"q_tpch_q4 lost its semi join:\n$p4")
    // Q13: the join stays LEFT OUTER (a post-join filter would flip it
    // inner and silently drop zero-order customers) and the two-level
    // aggregation adds at most 2 hash exchanges.
    val p13 = finalPlan(q("q_tpch_q13"))
    assert(p13.contains("LeftOuter"), s"q_tpch_q13 lost outer join:\n$p13")
    assert(count(p13, "Exchange hash") <= 2, s"q_tpch_q13:\n$p13")
    // event props: one exchange on the bounded (event_type, day) grain.
    val pp = finalPlan(q("q_event_props"))
    assert(count(pp, "Exchange (hash|range)") == 1, s"q_event_props:\n$pp")
    // Q3 (r9): every filter reaches its scan BEFORE the joins, and the
    // top-10 takes the per-partition-heap path — no range-exchange
    // global sort may materialize for LIMIT n.
    val p3 = finalPlan(q("q_tpch_q3"))
    assert(count(p3, "PushedFilters: \\[[^\\]]") >= 3,
      s"q_tpch_q3 filters not pushed:\n$p3")
    assert(p3.contains("TakeOrderedAndProject"), s"q_tpch_q3:\n$p3")
    assert(count(p3, "Exchange rangepartitioning") == 0, s"q_tpch_q3:\n$p3")
    // Q6 (r9): the purest pushdown benchmark — ONE scan with the
    // date/discount/quantity predicates all pushed, a single-group
    // aggregate, zero joins, zero hash exchanges beyond the one-row
    // final agg (which Spark plans exchange-free via partial+final).
    val p6 = finalPlan(q("q_tpch_q6"))
    assert(count(p6, "Scan parquet") == 1 &&
      p6.contains("PushedFilters: [IsNotNull"), s"q_tpch_q6:\n$p6")
    assert(count(p6, "Exchange hash") == 0, s"q_tpch_q6:\n$p6")
    // Q18 (r9): the HAVING tail is aggregated BEFORE the joins (partial
    // agg on lineitem, then the selectivity-bounded survivors drive the
    // joins) and the top-100 takes the heap path.
    val p18 = finalPlan(q("q_tpch_q18"))
    assert(p18.contains("TakeOrderedAndProject"), s"q_tpch_q18:\n$p18")
    assert(count(p18, "Exchange rangepartitioning") == 0, s"q_tpch_q18:\n$p18")
  }

  test("TPC-H r9 additions keep their documented shapes") {
    // Q7: both nation lookups ride broadcasts and the shipdate window
    // is pushed to the lineitem scan. The registered NATION_1/NATION_2
    // pair is empty at sf0.001 and AQE would collapse the whole plan to
    // EmptyRelation — audit a pair with rows so the join shapes exist.
    val p7 = finalPlan(
      graft.operators.Relational.tpchQ7(spark, sf0001,
        nationA = "NATION_12", nationB = "NATION_10"))
    assert(count(p7, "BroadcastHashJoin") >= 2, s"q_tpch_q7:\n$p7")
    assert(p7.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q_tpch_q7 shipdate filter not pushed:\n$p7")
    // Q8: the part-type and ASIA-customer prunes stay SEMI joins (an
    // inner rewrite would duplicate lines if keys ever repeated).
    val p8 = finalPlan(q("q_tpch_q8"))
    assert(count(p8, "LeftSemi") >= 2, s"q_tpch_q8 lost a semi prune:\n$p8")
    // Q10: top-20 takes the per-partition-heap path, never a global
    // range sort; returnflag and the order window both push to scans.
    val p10 = finalPlan(q("q_tpch_q10"))
    assert(p10.contains("TakeOrderedAndProject"), s"q_tpch_q10:\n$p10")
    assert(count(p10, "Exchange rangepartitioning") == 0, s"q_tpch_q10:\n$p10")
    assert(p10.contains("EqualTo(l_returnflag,R)"),
      s"q_tpch_q10 returnflag not pushed:\n$p10")
    // Q14: single-group aggregate — the ship-month filter pushes, and
    // there is no hash exchange beyond the join itself (the one-row
    // final agg plans partial+final, exchange-free at the agg grain).
    val p14 = finalPlan(q("q_tpch_q14"))
    assert(p14.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q_tpch_q14 shipdate filter not pushed:\n$p14")
    // Q15: max-equality resolves through the broadcast one-row max —
    // no window over the revenue frame, and lineitem is scanned ONCE
    // (the reference's view-self-join would scan it twice; Spark reuses
    // the exchange under AQE, so pin the scan budget instead).
    val p15 = finalPlan(q("q_tpch_q15"))
    assert(!p15.contains("Window"), s"q_tpch_q15 grew a window:\n$p15")
    // Q17: the brand prune left-semi-gates lineitem BEFORE the per-part
    // stats pass, and the 0.2·avg threshold never materializes a
    // fractional average (no division anywhere in the filter).
    val p17 = finalPlan(q("q_tpch_q17"))
    assert(count(p17, "LeftSemi") >= 1, s"q_tpch_q17 lost its prune:\n$p17")
    // Q22: dormancy stays a LEFT ANTI join; the one-row avg broadcasts.
    val p22 = finalPlan(q("q_tpch_q22"))
    assert(p22.contains("LeftAnti"), s"q_tpch_q22 lost its anti join:\n$p22")
    assert(count(p22, "BroadcastNestedLoopJoin|BroadcastExchange") >= 1,
      s"q_tpch_q22 avg not broadcast:\n$p22")
  }

  test("TPC-H suite completion (r9: Q2/Q9/Q11/Q12/Q16/Q19/Q20/Q21)") {
    // Q2: part and region-supplier prunes left-semi-gate the pair
    // aggregate; the top-100 takes the per-partition-heap path.
    val p2 = finalPlan(q("q_tpch_q2"))
    assert(count(p2, "LeftSemi") >= 2, s"q_tpch_q2 lost a prune:\n$p2")
    assert(p2.contains("TakeOrderedAndProject"), s"q_tpch_q2:\n$p2")
    assert(count(p2, "Exchange rangepartitioning") == 0, s"q_tpch_q2:\n$p2")
    // Q9: the name LIKE pushes to the part scan as StringContains-family
    // predicates; only the 25-row nation dim broadcasts unconditionally.
    val p9 = finalPlan(q("q_tpch_q9"))
    assert(p9.contains("StringEndsWith(p_name,widget)") ||
      p9.contains("StringContains(p_name,widget)"),
      s"q_tpch_q9 name filter not pushed:\n$p9")
    // Q11: the global (total, n) scalar broadcasts as one row; no
    // window, no second lineitem scan (the per-part frame re-aggregates).
    val p11 = finalPlan(q("q_tpch_q11"))
    assert(!p11.contains("Window"), s"q_tpch_q11 grew a window:\n$p11")
    assert(count(p11, "Scan parquet [^\\n]*lineitem") == 1,
      s"q_tpch_q11 scans lineitem twice:\n$p11")
    // Q12: both lineitem predicates (returnflag + ship-year) push.
    val p12 = finalPlan(q("q_tpch_q12"))
    assert(p12.contains("EqualTo(l_returnflag,R)") &&
      p12.contains("IsNotNull(l_shipdate)"),
      s"q_tpch_q12 filters not pushed:\n$p12")
    // Q16: the blacklist stays a LEFT ANTI join (a NOT IN rewrite to a
    // nested-loop null-aware join would be the scale trap here — the
    // blacklist side is provably non-null so the anti join is safe).
    // Pinned on the OPTIMIZED LOGICAL plan: the sf0.001 blacklist is
    // empty, and AQE correctly eliminates an anti join against an empty
    // build side from the physical plan — the logical shape is the
    // invariant that survives at scale.
    val df16 = q("q_tpch_q16")
    val l16 = df16.queryExecution.optimizedPlan.toString
    assert(l16.contains("LeftAnti"), s"q_tpch_q16 lost its anti join:\n$l16")
    // Q19: THE pin this query exists for — the disjunctive predicate
    // must NOT demote the equi-join to a nested-loop/cartesian plan.
    val p19 = finalPlan(q("q_tpch_q19"))
    assert(!p19.contains("BroadcastNestedLoopJoin") &&
      !p19.contains("CartesianProduct"),
      s"q_tpch_q19 fell off the hash join:\n$p19")
    assert(count(p19, "Join") >= 1, s"q_tpch_q19:\n$p19")
    // Q20: the qualifying-pair set left-semi-prunes the suppliers, and
    // the part prune left-semi-gates lineitem before the pair aggregate.
    val p20 = finalPlan(q("q_tpch_q20"))
    assert(count(p20, "LeftSemi") >= 2, s"q_tpch_q20 lost a prune:\n$p20")
    // Q21: the exists/not-exists pair resolves through ONE per-order
    // aggregate (no lineitem self-join chain) and the top-100 heaps.
    val p21 = finalPlan(q("q_tpch_q21"))
    assert(p21.contains("TakeOrderedAndProject"), s"q_tpch_q21:\n$p21")
    assert(count(p21, "Exchange rangepartitioning") == 0, s"q_tpch_q21:\n$p21")
    assert(count(p21, "Scan parquet [^\\n]*lineitem") <= 2,
      s"q_tpch_q21 scans lineitem more than its two passes:\n$p21")
  }

  test("span dedup: block-grain explodes, partial-agg stats, no global sort") {
    val p = finalPlan(q("q_span_dedup"))
    // The block stream is consumed twice (stats aggregate + join-back),
    // same documented shape as boilerplate's occurrence stream — so
    // exactly TWO block-grain generators, never more, and never a
    // token-grain explode (which would multiply the stream k-fold).
    assert(count(p, "Generate posexplode") == 2, s"q_span_dedup:\n$p")
    // The df/first-occurrence stats pass partial-aggregates (map-side
    // combine before its exchange) so a hot block never concentrates.
    assert(p.contains("partial_count"), s"q_span_dedup:\n$p")
    // Reassembly sorts inside each doc's collected array, never the
    // corpus: no range exchange anywhere.
    assert(count(p, "Exchange rangepartitioning") == 0, s"q_span_dedup:\n$p")
  }

  test("corpus-stat plans stay within their documented scan budget") {
    // boilerplate: occurrence stream consumed twice (tf aggregate +
    // skew-splittable join back) plus the zero-row backfill list = 3;
    // lm_score: tf frame is pinned (localCheckpoint), so the final plan
    // scans only the join-back stream + the backfill list = 2; tfidf
    // derives df from a window over the first aggregate's output = 2.
    // decontaminate: BoundedCollectLong rides the df aggregate, so the
    // inverted index needs exactly ONE corpus scan.
    Seq("q_boilerplate" -> 3, "q_lm_score" -> 2, "q_tfidf_terms" -> 2,
      "q_decontaminate" -> 1)
      .foreach { case (name, maxScans) =>
        val p = finalPlan(q(name))
        assert(count(p, "Scan parquet") <= maxScans,
          s"$name scans grew past $maxScans:\n$p")
      }
  }

  test("no corpus-stream windows: df/total stats come from compact aggregates") {
    // VERDICT r4 fixes #2/#3: a count-over-window on a raw token/shingle
    // stream pins a Zipf-hot partition on one task (AQE skew-split never
    // repairs window exchanges), and a partitionBy()-empty window drags
    // every row through a single task. Both queries must derive their
    // second-grain stats (df caps, corpus totals) from compact hash
    // aggregates joined/broadcast back — i.e. plan NO Window at all.
    Seq("q_decontaminate", "q_lm_score").foreach { name =>
      val p = finalPlan(q(name))
      assert(!p.contains("Window"),
        s"$name reintroduced a window over a corpus stream:\n$p")
    }
  }

  test("near-dup candidate generation joins on buckets, never nested loops") {
    Seq("q_minhash_pairs", "q_simhash64_neighbors", "q_embedding_neardup",
      "q_knn_join").foreach { name =>
      val p = finalPlan(q(name))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$name fell into an all-pairs join:\n$p")
    }
  }

  test("banded LSH self-joins reuse the signature exchange (§8.8)") {
    // The (vec_id, tbl, sig) subtree is expensive (NumTables × h dot
    // products per vector) and feeds BOTH sides of the candidate
    // self-join — identical shuffle-hash exchanges must collapse into
    // one computed + one ReusedExchange, the same guarantee
    // q_minhash_pairs carries for its banded-signature subtree.
    Seq("q_embedding_neardup", "q_knn_join", "q_minhash_pairs")
      .foreach { name =>
        val p = finalPlan(q(name))
        assert(p.contains("ReusedExchange"),
          s"$name computes its signature subtree twice:\n$p")
      }
  }

  test("IVF hash-sample seed: no global sort anywhere in training (§8.8)") {
    // seedCentroidsOf is orderBy(md5, vec_id).limit(k) — it must plan
    // as TakeOrderedAndProject (per-partition k-row heaps + driver
    // merge), never a range-exchange global Sort: the seed selection
    // runs over the WHOLE corpus at build time, exactly where a
    // single-task sort would pin 100 TB. rangepartitioning appears
    // in no IVF plan at all (the only sorts are per-partition,
    // inside window/aggregate operators).
    Seq("q_ann_ivf", "q_ann_ivf_served").foreach { name =>
      val p = finalPlan(q(name))
      assert(!p.contains("rangepartitioning"),
        s"$name grew a global sort exchange:\n$p")
    }
    // The Lloyd loop materializes its iterations via localCheckpoint,
    // so the seed subtree never appears in q_ann_ivf's FINAL plan —
    // pin the seed frame's own plan instead.
    import graft.operators.Similarity
    val c = Similarity.normalizedCorpus(spark, sf0001)
    val p = finalPlan(
      Similarity.seedCentroidsOf(c, Similarity.centroidCountFor(c.count())))
    assert(p.contains("TakeOrderedAndProject") &&
      !p.contains("rangepartitioning"),
      s"seed selection must be heap-merge, not a global sort:\n$p")
  }

  test("content-addressed takedown SERVE path never scans the corpus " +
      "(r15, VERDICT r14 next #1)") {
    // The served resolver answers from the standing content index:
    // shingle postings partition-pruned to the probes' hash buckets
    // for candidates, the index docstore for the containment verify.
    // Pin what made the inline form corpus-order: no documents-table
    // scan (no `text` derivation from the corpus — the passage
    // fixture is localCheckpoint-pinned before the plan), and no
    // Generate (the per-request corpus shingle explode is exactly
    // what the index removed; the build paid it once). The exact tier
    // is audited through Takedown.servedExact — the production
    // subtree the public form localCheckpoint-pins out of its final
    // plan (the IVF-seed precedent).
    import graft.operators.{ContentIndex, Takedown, TextOps}
    import org.apache.spark.sql.functions.{col, concat_ws, lit, slice}
    val idx = s"${tmpDir("plan_content_idx")}/idx"
    ContentIndex.buildBatch(spark,
      Tables.documents(spark, sf0001), idx, 0L)
    val passages = Tables.documents(spark, sf0001)
      .where(col("doc_id") === 8L)
      .select(lit(0L).as("passage_id"),
        concat_ws(" ",
          slice(TextOps.tokens(col("text")), 2, 5)).as("passage"))
    // Candidate tier (audited pre-pin — the resolver localCheckpoints
    // it, which truncates its scan out of downstream final plans): the
    // shingle scan prunes to the probes' sb buckets, never touches the
    // corpus, never re-explodes shingles.
    val pc = finalPlan(Takedown.servedCandidates(spark, idx, passages))
    assert(!pc.contains("documents.parquet"),
      s"candidate tier scanned the corpus:\n$pc")
    assert(!pc.contains("Generate"),
      s"candidate tier re-exploded shingles at serve:\n$pc")
    assert("PartitionFilters: \\[[^\\]]*sb".r.findFirstIn(pc).nonEmpty,
      s"shingle scan lost its bucket partition filter:\n$pc")
    // Verify tier: candidate texts come from the index docstore,
    // partition-pruned to the candidates' db buckets — without that
    // the stored-text scan re-reads every live doc and the serve cost
    // equals the inline resolver's (the first ×100 run measured
    // exactly that).
    val p = finalPlan(Takedown.servedExact(spark, idx, passages))
    assert(!p.contains("documents.parquet"),
      s"served content resolution scanned the corpus:\n$p")
    assert(!p.contains("Generate"),
      s"served content resolution re-exploded shingles at serve:\n$p")
    assert("PartitionFilters: \\[[^\\]]*db".r.findFirstIn(p).nonEmpty,
      s"docstore scan lost its doc-bucket partition filter:\n$p")
  }

  test("analytic surface keeps its documented shuffle/scan budget") {
    // leadlag: both windows partition by user_id, so ONE exchange serves
    // all four functions (the second window only re-sorts in place).
    val ll = finalPlan(q("q_event_leadlag"))
    assert(count(ll, "Scan parquet") == 1 &&
      count(ll, "Exchange (hash|range)") == 1,
      s"leadlag should be 1 scan + 1 shuffle:\n$ll")
    // pivot: explicit value domain — NO eager distinct-values pass, so
    // the whole query is one scan feeding the two-level pivot aggregate.
    val pv = finalPlan(q("q_event_pivot"))
    assert(count(pv, "Scan parquet") == 1 &&
      count(pv, "Exchange (hash|range)") <= 2,
      s"pivot should be 1 scan + the two-level aggregate:\n$pv")
    // anomaly: per-type moments come from a compact aggregate joined
    // back — no Window, and the daily aggregate's exchange is REUSED so
    // the events table is scanned once.
    val an = finalPlan(q("q_event_anomaly"))
    assert(count(an, "Scan parquet") == 1 && !an.contains("Window"),
      s"anomaly must reuse the daily aggregate, not rescan or window:\n$an")
    // approx quantiles: histogram grain + sketch grain = 2 narrow scans.
    val aq = finalPlan(q("q_approx_quantiles"))
    assert(count(aq, "Scan parquet") <= 2,
      s"approx quantiles reads (lang, n_chars) twice at most:\n$aq")
  }

  test("master model over a persisted txn frame: ONE pass over the fact") {
    // The §8.7 standing-pipeline claim, pinned: when the E1 driver
    // hands masterModelFrom a persisted transaction frame, the cost
    // aggregate's second pass becomes a cached read — the plan holds
    // cached scans plus exactly the lineitem + part parquet scans, and
    // still no Window.
    val txn = graft.operators.Relational.transactions(spark, sf0001)
      .persist()
    try {
      val df = graft.operators.Relational.masterModelFrom(txn,
        graft.Tables.lineitem(spark, sf0001),
        graft.Tables.part(spark, sf0001))
      df.collect()
      // Tree-walk, not string-count: the string rendering of an
      // InMemoryRelation embeds its CACHED lineage (parquet scans that
      // do not re-execute), while in the operator tree the cache read
      // is a leaf — exactly the distinction this test is about.
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def walk(p: SparkPlan, f: SparkPlan => Int): Int = {
        val nested = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, f)
          case q: QueryStageExec => walk(q.plan, f)
          case _ => 0
        }
        f(p) + nested + p.children.map(walk(_, f)).sum
      }
      val plan = df.queryExecution.executedPlan
      val parquetScans = walk(plan,
        { case _: FileSourceScanExec => 1; case _ => 0 })
      val cacheReads = walk(plan,
        { case _: InMemoryTableScanExec => 1; case _ => 0 })
      assert(!plan.toString.contains("Window"), s"window reappeared:\n$plan")
      assert(parquetScans == 2,
        s"persisted-txn master must scan parquet only for lineitem+part " +
          s"(got $parquetScans):\n$plan")
      assert(cacheReads >= 2,
        s"both branches must read the cached fact (got $cacheReads):\n$plan")
    } finally txn.unpersist()
  }

  test("cluster-safe split keeps its map-side join: the measured " +
      "broadcast dispatch, not a stats-blind sort-merge") {
    // The cluster frame is a stats-less localCheckpoint LogicalRDD —
    // without the measured dispatch the planner (and, observed, AQE)
    // falls back to a two-exchange SortMergeJoin of the full corpus
    // against a ~dozen-row map. Regression pin for the 45ff1a3 slip
    // that silently dropped the hint.
    val cs = finalPlan(q("q_cluster_split"))
    assert(count(cs, "BroadcastHashJoin") >= 1,
      s"cluster map must join map-side below the envelope bound:\n$cs")
    assert(!cs.contains("SortMergeJoin"),
      s"cluster split regressed to a corpus-wide sort-merge join:\n$cs")
  }

  test("r10 additions keep their documented shapes") {
    // Phrase search: the occ stream is cut to the phrase vocabulary by
    // a BROADCAST join before any exchange — no cartesian, no sort,
    // and only hash exchanges after the cut.
    val ph = finalPlan(q("q_phrase_search"))
    assert(count(ph, "BroadcastHashJoin") >= 1,
      s"phrase vocabulary cut must broadcast:\n$ph")
    assert(!ph.contains("CartesianProduct") && !ph.contains("SortMergeJoin"),
      s"phrase search grew a heavyweight join:\n$ph")
    // Drift monitor: ONE corpus scan — both features explode from the
    // same row pass (a second scan would double the 100 TB cost).
    val dr = finalPlan(q("q_drift_report"))
    assert(count(dr, "Scan parquet") == 1,
      s"drift monitor must histogram both features in one scan:\n$dr")
    // Bitext mining: the cross-scoring must broadcast the smaller
    // language side (BroadcastNestedLoopJoin on a bounded broadcast is
    // the documented shape) — never a CartesianProduct.
    val bt = finalPlan(q("q_bitext_mine"))
    assert(!bt.contains("CartesianProduct"),
      s"bitext cross-scoring fell back to a cartesian:\n$bt")
  }

  test("order+limit plans as TakeOrderedAndProject — no global sort") {
    val p = finalPlan(q("q_order_limit"))
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must take the per-partition-heap path:\n$p")
    assert(count(p, "Exchange rangepartitioning") == 0 && !p.contains("Sort "),
      s"a range-exchange global sort must never materialize for LIMIT n:\n$p")
  }

  test("business queries push projections into the scans") {
    val p = finalPlan(q("q_performance_metrics"))
    assert(count(p, "PushedFilters: \\[[^\\]]") >= 1, p)
  }

  test("r13 takedown/compaction rows keep their documented shapes") {
    // Logical takedown serve: term-pruned postings (pushed filter on
    // tok), the deleted set applied as a BROADCAST anti-join (takedown
    // sets are requests, never corpus-scale), stats = partial re-sum.
    val td = finalPlan(q("q_bm25_takedown"))
    assert(count(td, "BroadcastHashJoin LeftAnti|BroadcastHashJoin.*LeftAnti") >= 1,
      s"takedown deletes must anti-join as a broadcast:\n$td")
    assert(count(td, "PushedFilters: \\[[^\\]]") >= 1,
      s"postings scan lost its term pushdown:\n$td")
    assert(!td.contains("SortMergeJoin"),
      s"takedown serve grew a sort-merge join:\n$td")
    // Compacted serve: the fold removed the deletes and the per-batch
    // stats partials — the plan must be STRICTLY leaner than the
    // logical-takedown plan (fewer scans, no anti-join left; its
    // deletes dir holds only the ledger).
    val fc = finalPlan(q("q_bm25_compacted"))
    assert(count(fc, "Scan parquet") < count(td, "Scan parquet"),
      s"compaction failed to shed scans:\n$fc")
    assert(!fc.contains("SortMergeJoin"), fc)
    // CDC serve rows are plain version scans: zero exchanges.
    Seq("q_merge_publish_cdc", "q_merge_publish_cdc_stream",
      "q_takedown_corpus").foreach { name =>
      val p = finalPlan(q(name))
      assert(count(p, "Exchange (hash|range)") == 0,
        s"$name must be a bare published-version scan:\n$p")
    }
    // The CDC diff stays one keyed full-outer round.
    val vd = finalPlan(q("q_version_diff_cdc"))
    assert(count(vd, "Exchange (hash|range)") <= 2,
      s"CDC diff grew past its one full-outer exchange round:\n$vd")
  }
}
