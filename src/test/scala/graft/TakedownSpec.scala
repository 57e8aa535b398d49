package graft

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.operators.{Compaction, Dedup, Retrieval, Sampling, Similarity, Takedown}
import graft.sinks.Sinks

/** Delete-aware CDC, takedown propagation across the derived
  * artifacts, and exactly-once index compaction (r13 — VERDICT r12
  * missing #1/#2). The load-bearing identities:
  *
  *  - logical takedown on an index ≡ a from-scratch rebuild over the
  *    purged corpus, BIT-IDENTICAL (lex via the negative stats
  *    partial; pos by pure anti-join; IVF holding the trained
  *    centroids fixed);
  *  - compaction folds batches + deletes physically without changing
  *    one served byte, and the ledgers keep both ingest-batch and
  *    takedown replays exactly-once AFTER the partitions they used to
  *    overwrite are gone. */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)
  private def takedownIds = docs.where(col("doc_id") % 5 === 2)
    .select(col("doc_id"))
  private def purgedDocs = docs.join(takedownIds, Seq("doc_id"), "left_anti")

  private def servedRows(idx: String): Set[(Long, Long, Double, Int)] =
    Retrieval.bm25TopKServed(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  /** Two-batch lex index over the fixture corpus (the streaming-
    * maintained layout compaction targets). */
  private def buildLex(idx: String): Unit = {
    Retrieval.buildLexIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 0), idx, 0L)
    Retrieval.buildLexIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 1), idx, 1L)
  }

  test("lex takedown: served BM25 equals a rebuild over the purged " +
      "corpus bit for bit; replay and overlap never double-subtract") {
    val dir = tmpDir("td_lex")
    buildLex(s"$dir/idx")
    Takedown.takedownLex(spark, s"$dir/idx", takedownIds, 0L)
    val rebuilt = s"$dir/rebuilt"
    Retrieval.buildLexIndexBatch(spark, purgedDocs, rebuilt, 0L)
    val got = servedRows(s"$dir/idx")
    assert(got == servedRows(rebuilt),
      "takedown-served BM25 drifted from the purged-corpus rebuild")
    assert(got.nonEmpty)
    // Replay of the SAME takedown id: both writes overwrite themselves
    // and the correction re-derives excluding its own batch — served
    // rows must not move (a doubled correction shifts every score).
    Takedown.takedownLex(spark, s"$dir/idx", takedownIds, 0L)
    assert(servedRows(s"$dir/idx") == got, "takedown replay double-applied")
    // An OVERLAPPING second takedown (same ids + one more) subtracts
    // only the new doc.
    val extra = docs.where(col("doc_id") % 5 === 2 ||
      col("doc_id") === 1L).select(col("doc_id"))
    Takedown.takedownLex(spark, s"$dir/idx", extra, 1L)
    val rebuilt2 = s"$dir/rebuilt2"
    Retrieval.buildLexIndexBatch(spark,
      docs.join(extra, Seq("doc_id"), "left_anti"), rebuilt2, 0L)
    assert(servedRows(s"$dir/idx") == servedRows(rebuilt2),
      "overlapping takedown batches double-subtracted the stats")
    // Replay of takedown 0 AFTER the overlapping takedown 1 landed:
    // the smaller-id ownership rule recomputes the SAME correction
    // whatever landed since (r13 review — an exclude-my-own rule
    // would re-assign the overlap doc to batch 1 and the rewritten
    // batch-0 partial would under-subtract).
    Takedown.takedownLex(spark, s"$dir/idx", takedownIds, 0L)
    assert(servedRows(s"$dir/idx") == servedRows(rebuilt2),
      "takedown replay after a later overlapping batch drifted")
    // A FRESH id BELOW the applied high-water is rejected (ADVICE r13:
    // the smallest-id-owns rule would re-own the overlap docs and
    // double-subtract); ids 0 and 1 are applied, so a new id 0 < x < 1
    // cannot exist — but a fresh takedown at an id below max that was
    // never recorded must fail loudly. Fabricate by asking for id 0
    // after deleting its partition? No — simplest: a brand-new index
    // where id 5 lands first, then a fresh id 3 is refused while a
    // replay of 5 still passes.
    val mono = s"$dir/mono"
    buildLex(mono)
    Takedown.takedownLex(spark, mono, takedownIds, 5L)
    val e = intercept[IllegalArgumentException] {
      Takedown.takedownLex(spark, mono,
        docs.where(col("doc_id") === 1L).select("doc_id"), 3L)
    }
    assert(e.getMessage.contains("out-of-order"))
    Takedown.takedownLex(spark, mono, takedownIds, 5L) // replay: legal
  }

  test("pos takedown: served phrase results equal the purged rebuild") {
    val dir = tmpDir("td_pos")
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 0), s"$dir/idx", 0L)
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 1), s"$dir/idx", 1L)
    Takedown.takedownPos(spark, s"$dir/idx", takedownIds, 0L)
    Retrieval.buildPosIndexBatch(spark, purgedDocs, s"$dir/rebuilt", 0L)
    def rows(idx: String) = Retrieval.phraseSearchServed(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = rows(s"$dir/idx")
    assert(got == rows(s"$dir/rebuilt"))
    assert(got.nonEmpty, "fixture phrase found nothing — vacuous test")
  }

  test("ivf takedown: deleted vectors leave the serving set; results " +
      "equal a same-centroid rebuild over the purged vectors") {
    val dir = tmpDir("td_ivf")
    val emb = Tables.embeddings(spark, sf0001)
    Similarity.buildIvfIndexOf(spark, emb, s"$dir/idx")
    val dead = emb.where(col("vec_id") % 7 === 3)
      .select(col("vec_id").as("doc_id")) // recordDeletes casts by name
      .withColumnRenamed("doc_id", "vec_id")
    Takedown.takedownIvf(spark, s"$dir/idx",
      dead.withColumnRenamed("vec_id", "vec_id"), 0L)
    graft.expressions.DotProduct.register(spark)
    val queries = emb.where(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("nq", sqrt(call_function("dot_d", col("qv"), col("qv"))))
    val got = Similarity.queryIvfIndex(spark, s"$dir/idx", queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(got.nonEmpty)
    val deadSet = dead.collect().map(_.getLong(0)).toSet
    assert(got.forall { case (_, v, _) => !deadSet.contains(v) },
      "a taken-down vector was served")
    // Rebuild holding the TRAINED centroids fixed (they are structure,
    // not data): postings from purged vectors only.
    val purged = emb.join(dead, Seq("vec_id"), "left_anti")
    Similarity.buildIvfIndexWith(
      Similarity.normalizedCorpusOf(spark, purged),
      spark.read.parquet(s"$dir/idx/centroids"), s"$dir/rebuilt")
    val want = Similarity.queryIvfIndex(spark, s"$dir/rebuilt", queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("pair takedown: pairs die when either side is taken down") {
    val dir = tmpDir("td_pair")
    Dedup.buildPairTable(spark, sf0001, s"$dir/pairs")
    val all = Dedup.pairTable(spark, s"$dir/pairs")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.nonEmpty, "fixture has no near-dup pairs — vacuous")
    val dead = all.head._1
    Takedown.takedownPairs(spark, s"$dir/pairs",
      Seq(dead).toDF("doc_id"), 0L)
    val live = Takedown.pairTableLive(spark, s"$dir/pairs")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == all.filterNot(p => p._1 == dead || p._2 == dead))
  }

  test("pack takedown: original prefix + repacked suffix equals a full " +
      "repack of the purged corpus; the repack window scans only the " +
      "cut suffix") {
    val ids = takedownIds
    val original = Sampling.packSequencesOf(docs)
      .localCheckpoint() // the standing pack table the seeds read
    val affected = Takedown.affectedPacks(docs, ids, original)
      .select("lang", "from_pack_id")
    val prefix = original.join(broadcast(affected), Seq("lang"), "left")
      .where(col("from_pack_id").isNull ||
        col("pack_id") < col("from_pack_id"))
      .drop("from_pack_id")
    val suffix = Takedown.repackSuffix(docs, ids, original)
    val stitched = prefix.unionByName(suffix)
      .collect().map(_.toSeq).toSet
    val full = Sampling.packSequencesOf(purgedDocs)
      .collect().map(_.toSeq).toSet
    assert(stitched == full,
      "suffix repack drifted from the full repack of the purged corpus")
    // The cut is real: at least one pack survived untouched and at
    // least one repacked (otherwise the bounded-rewrite claim is
    // vacuous on this fixture).
    assert(prefix.count() > 0 && suffix.count() > 0)
    // Plan pin (VERDICT r13 #1 done-condition): the running-offset
    // window must consume the CUT-FILTERED suffix, never the full
    // stratum — every Window in the repack plan sits above the join
    // against the per-lang cut frame. affectedPacks itself is
    // window-free (the cut resolves by pack-range containment).
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWin}
    val plan = suffix.queryExecution.optimizedPlan
    val wins = plan.collect { case w: LWin => w }
    assert(wins.nonEmpty, "repackSuffix lost its seeded offset window")
    wins.foreach { w =>
      assert(w.child.collectFirst { case j: Join => j }.nonEmpty,
        s"repack window runs over an unfiltered frame:\n$w")
    }
    assert(Takedown.affectedPacks(docs, ids, original)
      .queryExecution.optimizedPlan
      .collect { case w: LWin => w }.isEmpty,
      "affectedPacks re-grew a window — the pack-range containment " +
        "join exists to avoid exactly that")
  }

  test("takedownAll: a crash between artifact legs replays to a " +
      "complete manifest; completed legs never double-apply") {
    val dir = tmpDir("td_all")
    Sinks.mergePublish(spark, docs, s"$dir/corpus", Seq("doc_id"))
    buildLex(s"$dir/lex")
    Retrieval.buildPosIndexBatch(spark, docs, s"$dir/pos", 0L)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // Poison the IVF leg: a plain FILE at the index path makes its
    // deletes write fail AFTER corpus/lex/pos completed — the
    // between-legs crash the manifest exists for.
    fs.create(new Path(s"$dir/ivf"), false).close()
    val targets = Takedown.TakedownTargets(
      corpusTableDir = Some(s"$dir/corpus"),
      lexIndexPath = Some(s"$dir/lex"),
      posIndexPath = Some(s"$dir/pos"),
      ivfIndexPath = Some(s"$dir/ivf"))
    intercept[Exception] {
      Takedown.takedownAll(spark, takedownIds, 0L, targets, s"$dir/m")
    }
    assert(!Takedown.manifestComplete(spark, s"$dir/m", 0L, targets),
      "manifest claims completion after a mid-orchestration crash")
    // The completed prefix IS manifested (so the replay skips it)...
    assert(Takedown.manifestComplete(spark, s"$dir/m", 0L,
      Takedown.TakedownTargets(corpusTableDir = Some(s"$dir/corpus"),
        lexIndexPath = Some(s"$dir/lex"),
        posIndexPath = Some(s"$dir/pos"))))
    // ...and the lex takedown really applied: served == purged rebuild.
    val rebuilt = s"$dir/rebuilt"
    Retrieval.buildLexIndexBatch(spark, purgedDocs, rebuilt, 0L)
    val after = servedRows(s"$dir/lex")
    assert(after == servedRows(rebuilt))
    // Heal the poisoned target and REPLAY the identical call: skipped
    // legs stay untouched (corpus version unchanged, lex stats not
    // double-subtracted), the missing leg completes, manifest closes.
    fs.delete(new Path(s"$dir/ivf"), false)
    Similarity.buildIvfIndexBatch(spark,
      Tables.embeddings(spark, sf0001), s"$dir/ivf", 0L)
    Takedown.takedownAll(spark, takedownIds, 0L, targets, s"$dir/m")
    assert(Takedown.manifestComplete(spark, s"$dir/m", 0L, targets))
    assert(servedRows(s"$dir/lex") == after,
      "replayed orchestration double-applied the lex leg")
    assert(!fs.exists(new Path(s"$dir/corpus/v=3")),
      "replayed orchestration re-merged the corpus leg")
    // The certificate over the healed constellation: zero dead
    // references anywhere.
    val cert = Takedown.erasureCertificate(spark, takedownIds, targets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(cert.length == 4 && cert.forall(_._3 == 0L), cert.mkString(", "))
    assert(cert.forall(_._2 > 0L), cert.mkString(", "))
  }

  test("resolveTakedownContent: token-boundary containment — the " +
      "source doc resolves, every match really contains the passage, " +
      "sub-shingle passages fail fast") {
    val d = docs.localCheckpoint()
    val passages = d.where(col("doc_id") === 8L)
      .select(lit(0L).as("passage_id"),
        concat_ws(" ",
          slice(operators.TextOps.tokens(col("text")), 2, 5)).as("passage"))
    val res = Takedown.resolveTakedownContent(d, passages)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(res.contains((8L, "exact")), res.mkString(", "))
    // Ground truth by brute force: padded contains over every doc.
    val p = passages.collect()(0).getString(1)
    val want = d.collect().filter { r =>
      val norm = r.getAs[String]("text").toLowerCase.trim
        .replaceAll("\\s+", " ")
      s" $norm ".contains(s" $p ")
    }.map(_.getAs[Long]("doc_id")).toSet
    assert(res.map(_._1).toSet == want,
      "shingle-probe + verify drifted from brute-force containment")
    val e = intercept[IllegalArgumentException] {
      Takedown.resolveTakedownContent(d,
        Seq((0L, "hash join")).toDF("passage_id", "passage"))
    }
    assert(e.getMessage.contains("fewer than 3 tokens"))
  }

  test("pair compaction crash between the two generation commits: the " +
      "pending deletes survive in the pair generation and the replay " +
      "completes the signature purge (r14 review #1)") {
    val dd = tmpDir("pair_crash")
    val half = docs.where(col("doc_id") % 2 === 0)
    Dedup.appendToPairTableBatch(spark, half, half,
      s"$dd/sigs", s"$dd/pairs", 0L)
    Dedup.appendToPairTableBatch(spark,
      docs.where(col("doc_id") % 2 === 1), docs,
      s"$dd/sigs", s"$dd/pairs", 1L)
    Takedown.takedownPairs(spark, s"$dd/pairs", takedownIds, 0L)
    def pairs = Takedown.pairTableLive(spark, s"$dd/pairs")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pairs
    assert(want.nonEmpty)
    val deadSet = takedownIds.collect().map(_.getLong(0)).toSet
    // Crash EXACTLY between the sig commit and the pair commit.
    val boom = new RuntimeException("crash between commits")
    val e = intercept[RuntimeException] {
      Compaction.compactPairTableWith(spark, s"$dd/pairs", s"$dd/sigs",
        betweenCommits = () => throw boom)
    }
    assert(e eq boom)
    // The crash state: sigs already purged in their NEW generation,
    // the pair root still current with its _deletes intact — the live
    // pair view is unchanged.
    val sigGen = Compaction.resolveRoot(spark, s"$dd/sigs")
    assert(sigGen == s"$dd/sigs/v=1", "sig generation did not commit")
    val sigDocs = spark.read.parquet(sigGen).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sigDocs.intersect(deadSet).isEmpty,
      "committed sig fold still carries taken-down docs")
    assert(pairs == want, "crash window changed the live pair view")
    // THE replay the crash implies (r14 review, second pass): the
    // stream re-delivers its LAST micro-batch — the max ingest id —
    // because its offsets never committed. The fold output lives at
    // batch_id=-1, so this replay lands NEXT TO the fold (its sig rows
    // duplicate folded rows; candidate generation and the next fold
    // both collapse them) instead of overwriting the folded signature
    // set, which a foldId = ingest.max output name would have lost
    // wholesale.
    Dedup.appendToPairTableBatch(spark,
      docs.where(col("doc_id") % 2 === 1), docs,
      s"$dd/sigs", s"$dd/pairs", 1L)
    assert(pairs == want, "crash-window batch replay changed the view")
    // Replay converges: both tables folded, deletes cleared, the live
    // view unchanged — and NO taken-down doc's signature survived
    // anywhere reachable.
    Compaction.compactPairTable(spark, s"$dd/pairs", s"$dd/sigs")
    assert(pairs == want)
    val pairGen = Compaction.resolveRoot(spark, s"$dd/pairs")
    assert(pairGen == s"$dd/pairs/v=1")
    val fs = new Path(dd).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$pairGen/_deletes/batch_id=0")),
      "deletes not cleared after the completed fold")
    val sigDocs2 = spark.read
      .parquet(Compaction.resolveRoot(spark, s"$dd/sigs"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigDocs2.intersect(deadSet).isEmpty)
  }

  test("deletes-only compaction: a one-shot flat index under a " +
      "takedown stream still folds (r14 review #4), and the corpus " +
      "takedown ledger never collides with ingest CDC ids (#3)") {
    val dir = tmpDir("flat_fold")
    val idx = s"$dir/idx"
    // One-shot FLAT lex index (no batch partitions at all).
    Retrieval.buildLexIndex(spark, sf0001, idx)
    Takedown.takedownLex(spark, idx, takedownIds, 0L)
    val want = servedRows(idx)
    val rebuilt = s"$dir/rebuilt"
    Retrieval.buildLexIndexBatch(spark, purgedDocs, rebuilt, 0L)
    assert(want == servedRows(rebuilt))
    // The fold must RUN (deletes-only work) and fold under the
    // bootstrap id, clearing the deletes.
    Compaction.compactLexIndex(spark, idx)
    val gen = Compaction.resolveRoot(spark, idx)
    assert(gen == s"$idx/v=1", "deletes-only fold never ran")
    assert(servedRows(idx) == want, "deletes-only fold changed serves")
    val fs = new Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$gen/deletes/batch_id=0")),
      "deletes not applied by the deletes-only fold")
    assert(!Compaction.compactionDue(spark, idx,
      sub = "postings", deletesSub = "deletes", threshold = 2),
      "compactionDue still firing after the fold — the starvation loop")
    // #3: a corpus whose ingest CDC stream already applied batch id 0
    // gets takedownAll with takedownId 0 — the D-batch must still
    // apply (negative-namespace ledger id), not silently no-op.
    val t = s"$dir/corpus"
    graft.sinks.Sinks.mergePublish(spark, docs, t, Seq("doc_id"))
    import spark.implicits._
    val touch = docs.limit(1).withColumn("op", lit("U"))
    graft.sinks.Sinks.mergePublishCdc(spark, touch, t, Seq("doc_id"),
      batchId = Some(0L)) // ingest CDC batch id 0 now on the ledger
    val targets = Takedown.TakedownTargets(corpusTableDir = Some(t))
    Takedown.takedownAll(spark, takedownIds, 0L, targets, s"$dir/m")
    val served = graft.sinks.Sinks.readLatest(spark, t)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deadSet = takedownIds.collect().map(_.getLong(0)).toSet
    assert(served.intersect(deadSet).isEmpty,
      "corpus takedown silently no-op'd against a colliding ingest " +
        "CDC batch id")
    assert(Takedown.manifestComplete(spark, s"$dir/m", 0L, targets))
  }

  test("erasure certificate packs leg: a corrupted pack table surfaces " +
      "as nonzero n_dead (no live/dead cancellation — r14 review #7)") {
    // Corrupt the standing pack table's doc ranges so the repack cut
    // MISSES every stratum: the stitched plan then keeps the stale
    // full-corpus packs — taken-down docs still sitting in training
    // packs, the exact compliance failure the leg exists to catch, and
    // one the old packed-minus-live difference could cancel to zero.
    // (Corrupting only token counts is NOT detectable when the cut
    // lands at pack 0 — the seeds never read the corrupt fields; the
    // algorithm is robust to that by construction.)
    val stale = Sampling.packSequencesOf(docs)
      .withColumn("first_doc", col("first_doc") + lit(1000000L))
      .withColumn("last_doc", col("last_doc") + lit(1000000L))
      .localCheckpoint()
    val cert = Takedown.erasureCertificate(spark, takedownIds,
      Takedown.TakedownTargets(),
      packSource = Some((Sampling.tokenCountsOf(docs), stale)))
    val packs = cert.where(col("artifact") === "packs").collect()(0)
    assert(packs.getLong(2) > 0L,
      "a stale pack table produced a clean certificate")
    // And the honest source is clean.
    val good = Takedown.erasureCertificate(spark, takedownIds,
      Takedown.TakedownTargets(),
      packSource = Some((Sampling.tokenCountsOf(docs),
        Sampling.packSequencesOf(docs))))
      .where(col("artifact") === "packs").collect()(0)
    assert(good.getLong(2) == 0L && good.getLong(1) > 0L)
  }

  test("mergePublishCdc: D removes, I/U upsert, latest op wins per key, " +
      "bootstrap deletes no-op, unknown ops fail fast, replay no-ops") {
    val t = s"${tmpDir("cdc")}/t"
    // Bootstrap WITH a delete of a never-seen key: ignored. The
    // ordering column (ts) is table schema like any CDC event time.
    assert(Sinks.mergePublishCdc(spark,
      Seq((1L, "a", 1L, "I"), (2L, "b", 1L, "I"), (9L, "x", 1L, "D"))
        .toDF("id", "s", "ts", "op"), t, Seq("id")) == 1)
    def state = Sinks.readLatest(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state == Set((1L, "a"), (2L, "b")))
    // I/U/D batch: delete 1, update 2, insert 3; lowercase ops accepted.
    assert(Sinks.mergePublishCdc(spark,
      Seq((1L, "a", 2L, "d"), (2L, "b2", 2L, "u"), (3L, "c", 2L, "i"))
        .toDF("id", "s", "ts", "op"), t, Seq("id"),
      batchId = Some(1L)) == 2)
    assert(state == Set((2L, "b2"), (3L, "c")))
    // Replay of the same batch id: ledger no-op.
    assert(Sinks.mergePublishCdc(spark,
      Seq((3L, "zzz", 9L, "D")).toDF("id", "s", "ts", "op"), t, Seq("id"),
      batchId = Some(1L)) == 2)
    assert(state == Set((2L, "b2"), (3L, "c")))
    // Coalesced trigger: per key the LATEST op wins — 2 gets
    // update-then-delete (gone), 3 delete-then-update (survives).
    assert(Sinks.mergePublishCdc(spark,
      Seq((2L, "u1", 3L, "U"), (2L, "u2", 4L, "D"),
          (3L, "v1", 3L, "D"), (3L, "v2", 4L, "U"))
        .toDF("id", "s", "ts", "op"), t, Seq("id"),
      latestBy = Seq("ts")) == 3)
    assert(state == Set((3L, "v2")))
    // diffVersions classifies the CDC delete as `removed`.
    val diff = Sinks.diffVersions(spark, t, 2, 3, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(diff == Set((2L, "removed"), (3L, "changed")))
    // Unknown op: loud, nothing published.
    val e = intercept[IllegalArgumentException] {
      Sinks.mergePublishCdc(spark,
        Seq((7L, "x", 9L, "UPSERT")).toDF("id", "s", "ts", "op"),
        t, Seq("id"))
    }
    assert(e.getMessage.contains("I/U/D"))
    assert(state == Set((3L, "v2")))
  }

  test("lex compaction: one folded partition serves the same bytes; " +
      "folded ingest batches and takedowns replay as no-ops") {
    val dir = tmpDir("fold_lex")
    val idx = s"$dir/idx"
    buildLex(idx)
    Takedown.takedownLex(spark, idx, takedownIds, 0L)
    val before = servedRows(idx)
    Compaction.compactLexIndex(spark, idx)
    assert(servedRows(idx) == before,
      "compaction changed served BM25 bytes")
    // Physically: the fold published a GENERATION (r14 — v=1 behind a
    // _latest marker) holding exactly one batch partition per subdir
    // and no delete partitions; the pre-fold flat layout survives as
    // the retained previous generation for readers in flight.
    val gen1 = Compaction.resolveRoot(spark, idx)
    assert(gen1 == s"$idx/v=1", s"fold did not publish generation 1: $gen1")
    val fs = new Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def parts(sub: String) = fs.listStatus(new Path(s"$gen1/$sub")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
    assert(parts("postings") == Seq("batch_id=1"), parts("postings"))
    assert(parts("doclens") == Seq("batch_id=1"))
    assert(parts("stats") == Seq("batch_id=1"))
    assert(parts("deletes").isEmpty, "deletes not cleared by the fold")
    assert(fs.exists(new Path(s"$idx/postings")),
      "previous generation reaped too early — in-flight readers race")
    // Replayed ingest batch 0 (its partition is GONE — pre-r13 this
    // re-appended and double-counted): ledger no-op.
    Retrieval.buildLexIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 0), idx, 0L)
    assert(servedRows(idx) == before, "folded ingest batch re-applied")
    // Replayed takedown 0 (its negative partial was folded in):
    // deletes ledger no-op — a re-stamp would double-subtract.
    Takedown.takedownLex(spark, idx, takedownIds, 0L)
    assert(servedRows(idx) == before, "folded takedown re-applied")
    // A FRESH batch and a FRESH takedown still apply after the fold.
    val extraDoc = Seq((900001L, "hash join hash join probe"))
      .toDF("doc_id", "text")
    Retrieval.buildLexIndexBatch(spark, extraDoc, idx, 2L)
    val rebuilt = s"$dir/rebuilt"
    Retrieval.buildLexIndexBatch(spark,
      purgedDocs.select("doc_id", "text").unionByName(extraDoc), rebuilt, 0L)
    assert(servedRows(idx) == servedRows(rebuilt),
      "post-fold ingest drifted from the equivalent rebuild")
    // A FRESH takedown post-compaction (r13 review: the deletes dir
    // holds only the _folded ledger then — zero data files, so no
    // batch_id partition column is discovered; this path used to
    // throw). Taking the fresh doc back down returns the index to the
    // exact pre-extra state.
    Takedown.takedownLex(spark, idx, Seq(900001L).toDF("doc_id"), 5L)
    assert(servedRows(idx) == before,
      "fresh takedown after compaction drifted")
  }

  test("generation fold crash recovery: stage debris, unmarked claim, " +
      "and half-done cleanup all converge to identical serves") {
    val dir = tmpDir("fold_recover")
    val idx = s"$dir/idx"
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 0), idx, 0L)
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 1), idx, 1L)
    def rows = Retrieval.phraseSearchServed(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows
    assert(want.nonEmpty)
    val fs = new Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // Crash state A: died in MATERIALIZE — a hidden .genstage-* dir.
    // Readers never saw it; the next compact reaps it and folds.
    fs.mkdirs(new Path(s"$idx/.genstage-deadbeef/junk"))
    Compaction.compactPosIndex(spark, idx)
    assert(rows == want, "stage-debris recovery changed serves")
    assert(!fs.listStatus(new Path(idx)).exists(
      _.getPath.getName.startsWith(".genstage-")))
    assert(Compaction.resolveRoot(spark, idx) == s"$idx/v=1")
    // Crash state B: died between CLAIM and COMMIT — an UNMARKED v=2.
    // Readers still resolve v=1 (max servable marker); recoverGen
    // drops the orphan claim and the next fold re-runs cleanly.
    fs.mkdirs(new Path(s"$idx/v=2/junk"))
    assert(Compaction.resolveRoot(spark, idx) == s"$idx/v=1",
      "an unmarked claim leaked into resolution")
    assert(rows == want, "unmarked claim changed serves")
    // Fresh work for the next fold that cannot change served content:
    // a takedown of an id absent from the corpus (anti-join removes
    // nothing; pos indexes carry no stats to correct).
    Takedown.takedownPos(spark, idx,
      Seq(999999999L).toDF("doc_id"), 0L)
    Compaction.compactPosIndex(spark, idx)
    assert(Compaction.resolveRoot(spark, idx) == s"$idx/v=2",
      "orphan-claim recovery blocked the next fold")
    assert(rows == want, "recovered fold changed serves")
    // Crash state C: died mid-CLEANUP after the marker delete
    // (marker-first order) — an unmarked OLD generation dir. recoverGen
    // reaps it; current serves never depended on it.
    fs.delete(new Path(s"$idx/_latest/1"), false)
    assert(rows == want)
    Retrieval.buildPosIndexBatch(spark, docs.limit(0), idx, 3L)
    Compaction.compactPosIndex(spark, idx)
    assert(!fs.exists(new Path(s"$idx/v=1")),
      "half-cleaned old generation not reaped")
    assert(rows == want, "cleanup recovery changed serves")
  }

  test("fold is reader-atomic: a concurrent reader hammering the serve " +
      "path across the fold never observes a missing file or a " +
      "half-state (VERDICT r13 #1)") {
    val dir = tmpDir("fold_atomic")
    val idx = s"$dir/idx"
    buildLex(idx)
    Takedown.takedownLex(spark, idx, takedownIds, 0L)
    val want = servedRows(idx)
    assert(want.nonEmpty)
    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 2).map { i =>
      new Thread(() => {
        while (!stop) {
          try {
            val got = servedRows(idx)
            if (got != want)
              failures.add(s"reader $i saw drifted rows (${got.size})")
          } catch {
            case e: Throwable =>
              failures.add(s"reader $i: ${e.getClass.getSimpleName}: " +
                s"${String.valueOf(e.getMessage).take(200)}")
          }
        }
      })
    }
    readers.foreach(_.start())
    try {
      // Two full folds under reader fire — the first migrates flat →
      // v=1, the second v=1 → v=2 and reaps the flat generation. A
      // fold is a content identity, and the inter-fold takedown
      // re-deletes ALREADY-DELETED ids under a fresh id (its "newly
      // deleted by this batch" set is empty → a zero stats correction,
      // zero new anti-join hits) — so served content NEVER changes and
      // ANY reader drift or exception is a protocol failure.
      Compaction.compactLexIndex(spark, idx)
      Takedown.takedownLex(spark, idx, takedownIds, 1L)
      Compaction.compactLexIndex(spark, idx)
    } finally {
      stop = true
      readers.foreach(_.join(30000))
    }
    assert(Compaction.resolveRoot(spark, idx) == s"$idx/v=2")
    assert(servedRows(idx) == want)
    val real = failures.toArray.map(_.toString)
    assert(real.isEmpty, real.mkString("\n"))
  }

  test("pos + ivf + pair compaction: folded tables serve identically " +
      "and collapse to one partition") {
    // pos
    val pd = tmpDir("fold_pos")
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 0), s"$pd/idx", 0L)
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 1), s"$pd/idx", 1L)
    Takedown.takedownPos(spark, s"$pd/idx", takedownIds, 0L)
    def prows = Retrieval.phraseSearchServed(spark, s"$pd/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pBefore = prows
    Compaction.compactPosIndex(spark, s"$pd/idx")
    assert(prows == pBefore)
    Retrieval.buildPosIndexBatch(spark,
      docs.where(col("doc_id") % 2 === 0), s"$pd/idx", 0L)
    assert(prows == pBefore, "folded pos batch re-applied")
    // ivf
    val vd = tmpDir("fold_ivf")
    val emb = Tables.embeddings(spark, sf0001)
    Similarity.buildIvfIndexBatch(spark,
      emb.where(col("vec_id") % 2 === 0), s"$vd/idx", 0L)
    Similarity.appendToIvfIndexBatch(spark,
      emb.where(col("vec_id") % 2 === 1), s"$vd/idx", 1L)
    graft.expressions.DotProduct.register(spark)
    val queries = emb.where(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("nq", sqrt(call_function("dot_d", col("qv"), col("qv"))))
    def vrows = Similarity.queryIvfIndex(spark, s"$vd/idx", queries)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vBefore = vrows
    Compaction.compactIvfIndex(spark, s"$vd/idx")
    assert(vrows == vBefore)
    // pair + signature
    val dd = tmpDir("fold_pair")
    val half = docs.where(col("doc_id") % 2 === 0)
    Dedup.appendToPairTableBatch(spark, half, half,
      s"$dd/sigs", s"$dd/pairs", 0L)
    Dedup.appendToPairTableBatch(spark,
      docs.where(col("doc_id") % 2 === 1), docs,
      s"$dd/sigs", s"$dd/pairs", 1L)
    def pairs = Takedown.pairTableLive(spark, s"$dd/pairs")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs
    assert(before.nonEmpty)
    Compaction.compactPairTable(spark, s"$dd/pairs", s"$dd/sigs")
    assert(pairs == before, "pair fold changed the table")
    Dedup.appendToPairTableBatch(spark, half, half,
      s"$dd/sigs", s"$dd/pairs", 0L)
    assert(pairs == before, "folded pair batch re-applied")
  }

  test("content index: served resolution ≡ inline over the live corpus;" +
      " takedown-aware; compaction and replays exactly-once") {
    val dir = tmpDir("content_idx")
    val idx = s"$dir/idx"
    operators.ContentIndex.buildBatch(spark,
      docs.where(col("doc_id") % 2 === 0), idx, 0L)
    operators.ContentIndex.buildBatch(spark,
      docs.where(col("doc_id") % 2 === 1), idx, 1L)
    val passages = docs.where(col("doc_id") === 8L)
      .select(lit(0L).as("passage_id"),
        concat_ws(" ",
          slice(operators.TextOps.tokens(col("text")), 2, 5)).as("passage"))
      .localCheckpoint()
    def served = Takedown
      .resolveTakedownContentServed(spark, idx, passages)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    def inline(d: org.apache.spark.sql.DataFrame) = Takedown
      .resolveTakedownContent(d, passages)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val full = inline(docs)
    assert(served == full && full.nonEmpty,
      "served content resolution drifted from the inline resolver")
    // Takedown: deletes drop docs from BOTH index readers immediately.
    Takedown.takedownContent(spark, idx, takedownIds, 0L)
    val live = inline(purgedDocs)
    assert(served == live,
      "takedown-aware served resolution drifted from the purged inline")
    // Physical fold: same bytes served, one consolidated generation.
    Compaction.compactContentIndex(spark, idx)
    assert(served == live, "content fold changed served resolution")
    // Replays against the folded ledgers: both must no-op.
    operators.ContentIndex.buildBatch(spark,
      docs.where(col("doc_id") % 2 === 0), idx, 0L)
    assert(served == live, "folded content batch re-applied")
    Takedown.takedownContent(spark, idx, takedownIds, 0L)
    assert(served == live, "folded content takedown re-applied")
  }

  test("content resolution id-pushdown envelope: a corpus-wide " +
      "boilerplate passage drives the literal and the distributed " +
      "branches to identical results, inline and served") {
    // Every doc carries the same boilerplate preamble, so the passage
    // matches the WHOLE corpus — the adversarial case VERDICT r15 #2
    // names: the resolved id set is corpus-match-bounded, far above
    // any request-bounded assumption. A cap of 10 forces the
    // distributed branch (matches ≫ 10); the default cap keeps the
    // literal IN-list plan. The two must be row-identical.
    val boiler = "terms of service apply to this document"
    val bDocs = docs.select(col("doc_id"),
        concat(lit(boiler + " "), col("text")).as("text"))
      .localCheckpoint()
    val nDocs = bDocs.count()
    val passages = spark.range(1)
      .select(lit(0L).as("passage_id"), lit(boiler).as("passage"))
    val dir = tmpDir("content_envelope")
    val idx = s"$dir/idx"
    operators.ContentIndex.buildBatch(spark, bDocs, idx, 0L)
    // Pair table over the boilerplate corpus for the expansion-seed
    // branch (every doc is a seed, so the seed set is corpus-scale
    // too — both collect sites cross the forced cap).
    Dedup.appendToPairTableBatch(spark, bDocs, bDocs,
      s"$dir/sigs", s"$dir/pairs", 0L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    val cap = 10L
    assert(nDocs > cap,
      "fixture corpus too small to exceed the forced cap")
    val servedLit = rows(Takedown.resolveTakedownContentServed(
      spark, idx, passages, Some(s"$dir/pairs")))
    val servedDist = rows(Takedown.resolveTakedownContentServed(
      spark, idx, passages, Some(s"$dir/pairs"), idPushdownCap = cap))
    assert(servedLit == servedDist && servedLit.nonEmpty,
      "served content resolution drifted across the pushdown envelope")
    assert(servedLit.count(_._3 == "exact") == nDocs,
      "boilerplate passage failed to match the whole corpus")
    val inlineLit = rows(Takedown.resolveTakedownContent(
      bDocs, passages, Some(s"$dir/pairs")))
    val inlineDist = rows(Takedown.resolveTakedownContent(
      bDocs, passages, Some(s"$dir/pairs"), idPushdownCap = cap))
    assert(inlineLit == inlineDist,
      "inline content resolution drifted across the pushdown envelope")
    assert(inlineLit == servedLit,
      "inline and served resolvers disagreed on the boilerplate corpus")
  }

  test("compactionDue: never fires while the accreting content was " +
      "never built (takedown stream racing ahead of ingest)") {
    // Lex shape: deletes accrete under deletes/, postings absent.
    val lx = tmpDir("cd_guard_lex")
    Takedown.recordDeletes(takedownIds, s"$lx/idx/deletes", 0L)
    assert(!Compaction.compactionDue(spark, s"$lx/idx",
      sub = "postings", deletesSub = "deletes", threshold = 1),
      "compactionDue fired on a never-built lex index")
    // Pair shape (root-accreting): only `_`-prefixed takedown debris.
    val pr = tmpDir("cd_guard_pair")
    Takedown.recordDeletes(takedownIds, s"$pr/pairs/_deletes", 0L)
    assert(!Compaction.compactionDue(spark, s"$pr/pairs",
      sub = "", deletesSub = "_deletes", threshold = 1),
      "compactionDue fired on a content-less pair root")
    // And the guard releases the moment content lands.
    operators.Dedup.appendToPairTableBatch(spark,
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 0),
      s"$pr/sigs", s"$pr/pairs", 0L)
    assert(Compaction.compactionDue(spark, s"$pr/pairs",
      sub = "", deletesSub = "_deletes", threshold = 1),
      "compactionDue stayed silent after content arrived")
  }

  test("erasure certificate packs leg: suffix-scoped ≡ full-table " +
      "symmetric difference — clean agrees clean, a seed-corrupting " +
      "misalignment below the cut is flagged by BOTH forms") {
    def leg(packs: org.apache.spark.sql.DataFrame, scoped: Boolean,
            dead: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Takedown.packCertLeg(Sampling.tokenCountsOf(docs),
        dead, packs, scoped).collect()(0)
      (r.getLong(1), r.getLong(2))
    }
    val honest = Sampling.packSequencesOf(docs).localCheckpoint()
    val deadSet = takedownIds.localCheckpoint()
    val (liveS, deadS) = leg(honest, scoped = true, deadSet)
    val (liveF, deadF) = leg(honest, scoped = false, deadSet)
    assert(deadS == 0L && deadF == 0L && liveS == liveF && liveS > 0L,
      s"clean pack table disagreed: scoped=($liveS,$deadS) " +
        s"full=($liveF,$deadF)")
    // Craft the misalignment the SUFFIX proof must still see: take
    // down only one lang's LAST doc (the cut lands at that lang's last
    // pack, so packs DO exist below the cut), then corrupt a
    // below-the-cut pack's token count by a full pack budget. The
    // corruption never enters the suffix rows directly — it feeds
    // affectedPacks' seed_offset, shifts every stitched suffix pack by
    // one pack_id, and must surface as difference rows in BOTH forms.
    val lang0 = docs.select(col("lang")).orderBy(col("lang")).limit(1)
      .collect()(0).getString(0)
    val lastDoc = docs.where(col("lang") === lang0)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val oneDead = docs.where(col("doc_id") === lastDoc)
      .select(col("doc_id")).localCheckpoint()
    val cutPack = honest.where(col("lang") === lang0)
      .agg(max(col("pack_id"))).collect()(0).getLong(0)
    assert(cutPack > 0L, "fixture lang packs into a single pack — " +
      "no below-the-cut row to corrupt")
    val misaligned = honest.withColumn("n_tokens",
      when(col("lang") === lang0 && col("pack_id") === 0L,
        col("n_tokens") + lit(Sampling.PackBudget.toLong))
        .otherwise(col("n_tokens")))
    val (_, deadS2) = leg(misaligned, scoped = true, oneDead)
    val (_, deadF2) = leg(misaligned, scoped = false, oneDead)
    assert(deadS2 > 0L, "suffix-scoped certificate missed a " +
      "seed-corrupting pack-table misalignment")
    assert(deadF2 > 0L, "full certificate missed the misalignment")
    // Sanity on the clean table with the same one-doc takedown.
    val (_, deadClean) = leg(honest, scoped = true, oneDead)
    assert(deadClean == 0L)
    // ADVICE r15 (high): subset-of-langs takedown whose cut is the
    // stratum's FIRST pack. All cuts sit at pack 0, so the scoped form
    // takes the skip-the-range-predicate fast path — which must still
    // restrict the stitched side to AFFECTED langs: the stitched frame
    // carries every untouched lang's standing packs via the prefix
    // join's isNull branch, and comparing it whole against the
    // affected-only repack put all of them into the symmetric
    // difference, certifying a perfectly clean takedown corrupt.
    val nLangs = docs.select(col("lang")).distinct().count()
    assert(nLangs > 1L, "fixture lost its multi-lang shape — the " +
      "subset-of-langs case needs an untouched stratum")
    val firstDoc = docs.where(col("lang") === lang0)
      .agg(min(col("doc_id"))).collect()(0).getLong(0)
    val firstDead = docs.where(col("doc_id") === firstDoc)
      .select(col("doc_id")).localCheckpoint()
    val (_, deadEarlyS) = leg(honest, scoped = true, firstDead)
    assert(deadEarlyS == 0L, "clean subset-of-langs takedown with an " +
      s"early cut certified corrupt by the scoped form (n_dead=$deadEarlyS)")
    val (_, deadEarlyF) = leg(honest, scoped = false, firstDead)
    assert(deadEarlyF == 0L, "clean subset-of-langs takedown with an " +
      s"early cut certified corrupt by the full form (n_dead=$deadEarlyF)")
  }
}
