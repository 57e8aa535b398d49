package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Layer sinks — reference parity for K1-K5 (SURVEY §2.7).
  *
  * The reference's medallion contract is WRITE_APPEND + CREATE_IF_NEEDED
  * into layer tables (`cloud_composer/datapipeline_gcp.py:236-238` etc.)
  * with ingest idempotency provided NOT by the sink but by the post-load
  * archival move (`gsutil mv ingested/ loaded/` — `:258-269`): a file can
  * only be appended once because it stops matching the ingest glob.
  * [[appendLayer]] + [[archive]] reproduce that contract; re-running an
  * ingest WITHOUT archiving duplicates rows (at-least-once), exactly as
  * the reference behaves.
  */
object Sinks {

  /** K1/K2: append into a layer table. Routes through the
    * [[graft.connect.Connectors]] sink seam (VERDICT r8 #3) — the
    * locator's scheme picks the connector; the parquet-dir default
    * writes with the incoming partitioning (no coalesce, every task
    * writes its own file, exactly how a 1000-executor append must
    * behave). */
  def appendLayer(df: DataFrame, layerPath: String): Unit =
    graft.connect.Connectors.sink(layerPath).append(df, layerPath)

  /** K3: CTAS — create-or-fail, the `CREATE TABLE ... AS SELECT` twin.
    * Optional partitioning: at warehouse scale the master layer is
    * partitioned on its dominant filter column so downstream scans
    * prune directories (`PartitionFilters` in the plan). Connector-
    * routed like [[appendLayer]]. */
  def createTableAs(df: DataFrame, tablePath: String,
                    partitionBy: Seq[String] = Nil): Unit =
    graft.connect.Connectors.sink(tablePath).create(df, tablePath, partitionBy)

  /** K4: staged CSV object write (header row, like the generator upload
    * `create_campaigns/csv/main.py:33-43`). Whitespace-exact: Spark's
    * CSV writer trims leading/trailing whitespace by default
    * (`ignore*WhiteSpace` default TRUE on write, false on read), which
    * silently corrupts padded values on the stage→load round trip —
    * disabled here so the staged bytes are the frame's bytes. */
  def writeCsvObjects(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** K5: archival move — relocate every file matching `srcGlob` into
    * `destDir` (Hadoop rename, atomic per file on a real filesystem).
    * Returns the number of files moved. */
  def archive(spark: SparkSession, srcGlob: String, destDir: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val glob = new Path(srcGlob)
    val fs = glob.getFileSystem(conf)
    val dest = new Path(destDir)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    val files = Option(fs.globStatus(glob)).getOrElse(Array.empty)
    files.count { st =>
      fs.rename(st.getPath, new Path(dest, st.getPath.getName))
    }
  }

  /** Bucketed catalog table: pre-shuffling a fact on its join key at
    * write time buys exchange-free (co-located) joins for every
    * downstream consumer — the standing-warehouse answer to repeated
    * 100 TB shuffles. Both sides of a join must share bucket count and
    * key. */
  def writeBucketedTable(df: DataFrame, table: String, buckets: Int,
                         key: String, sortKeys: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Small-file compaction: rewrite a parquet layer into files of
    * roughly `targetBytes` each (sized from the source's actual on-disk
    * bytes, not guessed row counts). Streaming ingest and fine-grained
    * appends accrete small files that tax every later scan with
    * per-file open/footer costs and starve scan parallelism of balanced
    * splits; periodic compaction is the standing-lake answer. The
    * rewrite is one round-robin repartition — an all-to-all shuffle of
    * the layer, run it off-peak — and lands in `destDir` so the swap
    * into place stays atomic (rename) and readers never see a
    * half-compacted layer. Returns the output file count. */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
              targetBytes: Long = 128L << 20): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val bytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(srcDir).repartition(nFiles)
      .write.mode("errorifexists").parquet(destDir)
    nFiles
  }

  /** Idempotent partition-grain reload: overwrite ONLY the hive
    * partitions present in `df`, leaving sibling partitions untouched
    * (dynamic partition overwrite, scoped to this write via the
    * `partitionOverwriteMode` option — no session-wide config
    * mutation). This is the exactly-once shape for re-running one day
    * of a dated layer: replaying the batch converges instead of
    * duplicating, and a 1000-executor rewrite of one partition never
    * touches the other 100 TB. */
  def overwritePartitions(df: DataFrame, tablePath: String,
                          partitionBy: Seq[String]): Unit =
    graft.connect.Connectors.sink(tablePath)
      .overwritePartitions(df, tablePath, partitionBy)

  /** Keyed upsert (poor-man's MERGE) into a parquet layer: incoming
    * rows replace existing rows with the same key; everything else
    * survives. Plain parquet has no row-level transaction log, so the
    * merge is survivors (existing LEFT ANTI incoming on the key) UNION
    * incoming, written to a fresh directory and swapped into place by
    * two renames. Readers never see a BLEND of old and new rows, but
    * the swap is not atomic: there is a brief window between the
    * renames where the layer path does not exist (a concurrent read
    * errors rather than returning partial data, and a crash in the
    * window is recovered by the next upsert via the `.upsert_old`
    * restore below) — a transactional table format is the graduation
    * path for true atomicity. When the table is partitioned and keys
    * map to partitions, [[overwritePartitions]] is the cheaper
    * partition-grain variant (it rewrites only touched partitions).
    * At 100 TB either beats a row-wise write-amplifying update. */
  /** `latestBy`: when a single incoming batch can carry several rows
    * per key (CDC insert + update coalesced into one trigger), name the
    * ordering columns — the row with the greatest (latestBy, …) value
    * wins deterministically. With `latestBy` empty, incoming MUST be
    * key-unique; the merge fails fast otherwise rather than silently
    * landing conflicting rows for one key. */
  def upsert(spark: SparkSession, incoming: DataFrame, layerPath: String,
             keys: Seq[String], latestBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val deduped = latestWins(incoming, layerPath, keys, latestBy)
    val conf = spark.sparkContext.hadoopConfiguration
    val layer = new Path(layerPath)
    val fs = layer.getFileSystem(conf)
    val old = new Path(layerPath + ".upsert_old")
    // Crash recovery: a previous run that died between its two renames
    // left the data stranded at .upsert_old — restore it first (and
    // fail loudly if the restore fails: falling through would write
    // only the incoming batch and later DELETE the stranded layer).
    if (!fs.exists(layer) && fs.exists(old) && !fs.rename(old, layer))
      throw new java.io.IOException(
        s"upsert recovery failed: cannot restore $old to $layerPath")
    if (!fs.exists(layer)) {
      deduped.write.parquet(layerPath)
    } else {
      val merged = spark.read.parquet(layerPath)
        .join(deduped.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(deduped)
      val tmp = new Path(layerPath + ".upsert_tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(old)) fs.delete(old, true)
      if (!fs.rename(layer, old))
        throw new java.io.IOException(s"upsert swap failed for $layerPath")
      if (!fs.rename(tmp, layer)) {
        if (!fs.rename(old, layer)) // restore — never leave the path missing
          throw new java.io.IOException(
            s"upsert swap failed AND restore failed for $layerPath — " +
              s"data is at $old")
        throw new java.io.IOException(s"upsert swap failed for $layerPath")
      }
      fs.delete(old, true)
    }
  }

  /** Latest-wins key dedup shared by [[upsert]] and [[mergePublish]]:
    * with `latestBy` named, the greatest (latestBy…) row per key wins
    * deterministically; without it, a multi-row key fails fast (the
    * merge would be undefined). */
  private def latestWins(incoming: DataFrame, target: String,
                         keys: Seq[String], latestBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, row_number}
    if (latestBy.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(latestBy.map(c => col(c).desc): _*)
      incoming.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    } else {
      val dups = incoming.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
      if (!dups.isEmpty)
        throw new IllegalArgumentException(
          s"merge into $target: incoming batch has duplicate keys " +
            s"and no latestBy ordering — 'latest wins' would be undefined")
      incoming
    }
  }

  /** Transactional keyed MERGE over the versioned-publish layout
    * (VERDICT r9 #6 — [[upsert]]'s merge semantics composed with
    * [[publishVersioned]]'s monotone marker pointer): read the current
    * latest version, replace matched keys with the incoming batch
    * (latest-wins within the batch via `latestBy`), insert unmatched
    * keys, and publish the result as a NEW version. Returns the
    * published version number.
    *
    * This is the Delta-style MERGE-then-commit, minus log compaction:
    * unlike [[upsert]]'s rename dance (whose tiny two-rename window
    * needed crash recovery), every intermediate state here is one of
    * the format's invariant states —
    *  - crash during the stage write: unreferenced `.stage-*` dir,
    *    readers untouched;
    *  - crash between the `v=n` rename and the marker create: readers
    *    still resolve the OLD max marker (the reader invariant the
    *    marker design guarantees), and the orphaned `v=n` is inert
    *    (next publish claims n+1; vacuum reclaims the orphan);
    *  - replay after any crash: re-reads the still-current version and
    *    re-merges — CONVERGES to the same table content (spec-pinned),
    *    because the merge is a pure function of (current, incoming).
    * Old versions stay readable ([[readVersion]]) and the change set is
    * one [[diffVersions]] call — MERGE, time travel, and diff compose
    * because they share the version layout.
    *
    * Scale shape: one left_anti shuffle on the keys over the current
    * version + a full write of the merged table — the same cost
    * envelope as [[upsert]] (no row-wise write amplification), plus
    * version isolation. A 100 TB table pays full-rewrite only because
    * this layout shares nothing between versions; the partition-grain
    * refinement ([[overwritePartitions]]) applies unchanged when keys
    * map to partitions. */
  def mergePublish(spark: SparkSession, incoming: DataFrame,
                   tableDir: String, keys: Seq[String],
                   latestBy: Seq[String] = Nil): Int =
    mergePublishWith(spark, incoming, tableDir, keys, latestBy)

  /** [[mergePublish]] with the OCC knobs exposed (test seam +
    * orphan-fence age; the public overload pins production defaults).
    *
    * SERIALIZABILITY (r10, second pass): read-merge-publish is a lost
    * update under concurrent publishers — A and B both merge from v=2,
    * both publish, and whichever marker lands last silently discards
    * the other's rows. The atomic no-overwrite version-number CLAIM is
    * the filesystem's compare-and-swap, so the commit rule is
    * CLAIM-ADJACENCY: commit the marker only when the claimed number
    * is exactly mergeBase+1 (our merge provably saw everything below
    * it). A publisher whose claim lands higher retracts its claim —
    * which no reader ever saw, because [[stageAndClaim]] doesn't write
    * the marker — re-reads the new current version, re-merges, and
    * retries. `beforeClaim` runs between the base read and the claim
    * (the race window), letting the spec inject a deterministic
    * interleaving.
    *
    * Orphan fencing: a publisher that crashed between claim and marker
    * leaves a claimed-but-unmarked gap version that would make every
    * later claim non-adjacent forever. A gap version older than
    * `orphanFenceMs` (by directory mtime) is deleted on retry; younger
    * gaps are presumed in-flight competitors — we just retry, and
    * either their marker lands (new base) or they age into fencing.
    * The crashed caller's batch replays idempotently (latest-wins
    * merge of the same rows converges — the crash-replay spec). */
  def mergePublishWith(spark: SparkSession, incoming: DataFrame,
                       tableDir: String, keys: Seq[String],
                       latestBy: Seq[String] = Nil,
                       batchId: Option[Long] = None,
                       orphanFenceMs: Long = 60000L,
                       beforeClaim: () => Unit = () => ()): Int = {
    import org.apache.spark.sql.functions.col
    val deduped = latestWins(incoming, tableDir, keys, latestBy)
    publishLoop(spark, tableDir, {
      case None => deduped
      case Some(current) => current
        .join(deduped.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(deduped)
    }, orphanFenceMs, beforeClaim, batchId)
  }

  /** Incremental AGGREGATE maintenance over the versioned publish: the
    * standing rollup table absorbs a delta (raw rows OR pre-aggregated
    * partials — the re-aggregation collapses either) by key-wise
    * re-aggregation of the named ADDITIVE measures, published through
    * the same claim-adjacency OCC loop as [[mergePublish]]. Additive
    * (SUM-of-long / COUNT) measures only: re-agg of partials equals
    * the full rebuild EXACTLY (the A10 property — integer sums are
    * order-insensitive), which is what makes maintaining a standing
    * 100 TB rollup by deltas safe; float measures would drift by
    * accumulation order and must carry micro-unit longs instead. Crash
    * semantics inherit from the versioned layout: every intermediate
    * state is an invariant state — and replay of an already-committed
    * delta (where additive merge would DOUBLE-COUNT, not being
    * idempotent by content) is closed IN THE ENGINE when the delta is
    * batch-keyed (r12, VERDICT r11 #5): pass `batchId` and each
    * version carries an applied-batch ledger file (`_applied`, staged
    * pre-claim so it commits atomically with the data); a delta whose
    * id the current version's ledger already lists is detected inside
    * the OCC loop and returns the current version untouched. Without a
    * batchId the caller owns replay protection, as before. */
  def mergeAggPublish(spark: SparkSession, delta: DataFrame,
                      tableDir: String, keys: Seq[String],
                      sums: Seq[String],
                      batchId: Option[Long] = None,
                      orphanFenceMs: Long = 60000L,
                      beforeClaim: () => Unit = () => ()): Int = {
    import org.apache.spark.sql.functions.{col, sum}
    require(sums.nonEmpty, "mergeAggPublish needs at least one measure")
    def reagg(df: DataFrame) =
      df.groupBy(keys.map(col): _*)
        .agg(sum(col(sums.head)).as(sums.head),
          sums.tail.map(c => sum(col(c)).as(c)): _*)
    publishLoop(spark, tableDir, {
      case None => reagg(delta)
      case Some(current) => reagg(current.unionByName(reagg(delta)))
    }, orphanFenceMs, beforeClaim, batchId)
  }

  /** The shared serializable publish loop: read the current version,
    * compute the successor state via `mergeOf`, claim, commit only on
    * claim-adjacency, retract-and-retry otherwise (scaladoc on
    * [[mergePublishWith]]). `mergeOf(None)` is the bootstrap.
    *
    * Fencing vs the fenced (ADVICE r10): a publisher merely STALLED
    * (not crashed) between claim and marker for longer than
    * `orphanFenceMs` can be fenced by a competitor — and must then
    * FAIL its commit loudly, never report success for a batch that was
    * discarded or whose number was re-claimed with different data.
    * Two mechanisms close this: (1) every claim carries a
    * publisher-owned token file inside the version directory, and
    * [[commitMarker]] verifies the token before AND after creating the
    * marker (see its scaladoc for the interleaving argument); (2) the
    * fence itself is rename-to-tombstone + marker re-check + delete,
    * not a blind delete — renaming first makes the fence visible to
    * the owner's token check in the same metadata op that makes the
    * data unreachable, and the re-check restores a version whose
    * marker landed between our staleness read and the rename. The
    * restore's third leg (r12): [[stageAndClaim]]'s MARKER EXCLUSION
    * guarantees no claimant retains a slot whose marker exists, so the
    * restore converges ([[restoreTombstone]]) instead of racing a
    * usurper — without it, a fresh claimant grabbing the freed slot
    * between fence and restore left uncommitted bytes under the
    * owner's committed marker (VERDICT r11 #1). Every interleaving
    * therefore ends in one of THREE states: (marker present ∧ the
    * OWNER's data present), (no marker ∧ the stalled publisher
    * throws), or — when the publisher dies inside commitMarker's
    * create→post-check window after its fenced claim was deleted — a
    * ZOMBIE marker with no data, which never carried readable state:
    * readers resolve past it (the servable rule in currentVersion),
    * marker exclusion keeps its number unclaimable, the
    * claim-adjacency check commits over all-zombie gaps, and
    * vacuumVersions reaps it. The serializability claim holds for
    * stalls and crashes both. */
  /** General versioned STATE-TRANSITION publish (r12): run an
    * arbitrary `mergeOf` transition (current state → successor state)
    * through the same claim-adjacency OCC loop, fencing, and
    * applied-batch ledger as [[mergePublish]] — for maintenance
    * operators whose transition is not a keyed merge (SCD2 apply, any
    * fold of a delta into standing state). `mergeOf(None)` is the
    * bootstrap. With a `batchId`, replaying a committed transition is
    * detected and returns the current version untouched — which is the
    * correctness condition whenever the transition is not idempotent
    * by content. Engine-internal seam (private[graft]): public callers
    * go through the named operators that pin their transition's
    * semantics with specs and oracle rows. */
  private[graft] def publishState(spark: SparkSession, tableDir: String,
                                  mergeOf: Option[DataFrame] => DataFrame,
                                  batchId: Option[Long],
                                  orphanFenceMs: Long = 60000L,
                                  beforeClaim: () => Unit = () => ()): Int =
    publishLoop(spark, tableDir, mergeOf, orphanFenceMs, beforeClaim,
      batchId)

  private def publishLoop(spark: SparkSession, tableDir: String,
                          mergeOf: Option[DataFrame] => DataFrame,
                          orphanFenceMs: Long,
                          beforeClaim: () => Unit,
                          batchId: Option[Long] = None): Int = {
    val root = new Path(tableDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    var attempts = 0
    var result = -1
    while (result < 0) {
      attempts += 1
      if (attempts > 64) {
        def ls(p: Path): String =
          try fs.listStatus(p).map(_.getPath.getName).sorted.mkString(",")
          catch { case _: java.io.IOException => "<unlistable>" }
        throw new IllegalArgumentException(
          s"mergePublish: lost the commit race $attempts times on " +
            s"$tableDir — pathological contention or a wedged orphan " +
            "claim below the fence age; back off at the caller " +
            s"[root: ${ls(root)}; markers: ${ls(new Path(root, MarkerDir))}]")
      }
      // Jittered linear backoff after a lost round: N publishers who
      // all retract and re-claim in lockstep can starve one of them
      // past any fixed attempt bound (observed at 4 writers under
      // suite load) — desynchronizing the retries is the standard
      // livelock remedy, and the sleep only triggers on contested
      // tables.
      if (attempts > 1) Thread.sleep(
        java.util.concurrent.ThreadLocalRandom.current()
          .nextLong(5L, 40L) * math.min(attempts, 8))
      val hasCurrent = fs.exists(root) &&
        (fs.exists(new Path(root, MarkerDir)) ||
          fs.exists(new Path(root, "LATEST")))
      val base = if (hasCurrent) currentVersion(fs, root) else 0
      // Applied-batch ledger (r12): with a batchId, a delta whose id is
      // already in the current version's ledger is a REPLAY — return
      // the current version untouched instead of re-merging (the
      // exactly-once guarantee additive merges cannot get from content
      // idempotence). The check sits INSIDE the retry loop so it is
      // re-evaluated against every fresh base the OCC loop observes.
      val applied: Set[Long] =
        if (base == 0) Set.empty else appliedBatches(fs, root, base)
      if (batchId.exists(applied.contains)) result = base
      else {
        val merged =
          if (base == 0) mergeOf(None)
          else mergeOf(Some(readVersion(spark, tableDir, base)))
        beforeClaim()
        // The ledger is carried forward even on an UN-keyed publish
        // (batchId = None): dropping it would silently disable replay
        // detection for every previously committed id the moment an
        // out-of-band correction touches the table.
        // A missing-file-rooted stage failure is a TRANSIENT of this
        // protocol, not an error: the merge's base read resolves
        // v=base's files, and a fence-restore transit (a fencer whose
        // staleness read lost to the owner's commit renames the dir
        // to a tombstone and back) can move them mid-scan. The base is
        // still committed and serving — re-enter the loop, re-resolve,
        // recompute (bounded by the same attempts guard).
        val c =
          try stageAndClaim(merged, tableDir,
            stamp = stageDir => {
              val ids = applied ++ batchId
              if (ids.nonEmpty) writeApplied(fs, stageDir, ids)
            })
          catch {
            case e: Throwable if missingFileRooted(e) => null
          }
        // Claim adjacency, zombie-aware (r12): a gap number carrying a
        // marker but neither data nor a tombstone is a crashed-commit
        // zombie — no state was ever readable there and marker
        // exclusion keeps it permanently unclaimable, so committing
        // over it skips nothing. Any other gap content (a live claim,
        // a committed version our base read missed, a restore in
        // flight) still forces the retract-and-retry.
        def zombieNumber(g: Int): Boolean =
          fs.exists(new Path(root, s"$MarkerDir/$g")) &&
            !fs.exists(new Path(root, s"v=$g")) &&
            !fs.listStatus(root).exists(
              _.getPath.getName.startsWith(s".fenced-$g-"))
        if (c == null) () // transient base move — loop re-reads
        else if (c.version == base + 1 ||
            ((base + 1) until c.version).forall(zombieNumber)) {
          commitMarker(spark, tableDir, c); result = c.version
        } else {
          // Non-adjacent claim: someone claimed (base, n) after our
          // read. Retract ours (invisible — no marker was written) by
          // RENAME-then-delete, never an in-place recursive delete:
          // Hadoop's local fullyDelete RE-LISTS children as it runs,
          // so the moment the slot empties a competitor's claim rename
          // can land in it and the still-running delete then chews the
          // competitor's fresh files — its claim token (observed in
          // soak as a spurious "fenced before commit" at a 10-minute
          // fence age) or, if it commits first, a COMMITTED version's
          // data files (observed as reader FileNotFoundException).
          // The rename releases the slot atomically; the delete then
          // touches only our private tombstone. Then fence aged
          // orphans in the gap so a crashed publisher can't wedge the
          // table.
          val fc = org.apache.hadoop.fs.FileContext
            .getFileContext(root.toUri, conf)
          val retract = new Path(root, s".retract-${c.token.take(8)}")
          fc.rename(new Path(root, s"v=${c.version}"), retract)
          fs.delete(retract, true)
          ((base + 1) until c.version)
            .foreach(g => fenceOrphan(fs, fc, root, g, orphanFenceMs))
        }
      }
    }
    result
  }

  /** Fence ONE aged claimed-but-unmarked gap version (factored out of
    * [[publishLoop]] r12 so the interleavings are spec-drivable).
    * Rename-first: after the tombstone rename the dir is gone from
    * `v=g`, so a stalled owner's commitMarker token check fails
    * deterministically. A competitor racing the same fence surfaces as
    * a rename IOException — it already moved the dir; nothing left for
    * us to do. The marker re-check after the rename catches an owner
    * whose marker landed between our staleness read and the rename:
    * that version is COMMITTED and must be restored, not reclaimed —
    * [[restoreTombstone]] carries the convergence argument.
    * Spec seams: `beforeRename` runs between the staleness read and
    * the tombstone rename (the window in which the owner's commit can
    * land, making the re-check/restore leg reachable); `afterRename`
    * runs between the rename and the re-check (the window a fresh
    * claimant would need to usurp the freed slot — the triple race
    * marker exclusion closes). */
  private[graft] def fenceOrphan(fs: org.apache.hadoop.fs.FileSystem,
                                 fc: org.apache.hadoop.fs.FileContext,
                                 root: Path, g: Int, orphanFenceMs: Long,
                                 beforeRename: () => Unit = () => (),
                                 afterRename: () => Unit = () => ()): Unit = {
    val p = new Path(root, s"v=$g")
    val marked = fs.exists(new Path(root, s"$MarkerDir/$g"))
    val now = System.currentTimeMillis()
    // The mtime read races competitors (exists → getFileStatus
    // TOCTOU): a vanished path can surface as FileNotFoundException
    // OR — on the local fs, whose status loads File.lastModified()
    // lazily — as a status carrying mtime 0, because lastModified()
    // returns 0 for a path that disappeared mid-read instead of
    // throwing. Treating 0 as an age made a retract-then-reclaim
    // window fatal: the fencer read the retracted dir as epoch-old,
    // then renamed away the owner's FRESH re-claim that landed before
    // its rename (observed as a rare soak failure at a 10-minute
    // fence age). A vanished path means a competitor moved it — the
    // same no-op as losing the rename race; no real claim dir carries
    // an epoch mtime (every stage is freshly written).
    val aged = !marked && fs.exists(p) && {
      val m =
        try fs.getFileStatus(p).getModificationTime
        catch { case _: java.io.FileNotFoundException => 0L }
      m > 0 && now - m > orphanFenceMs
    }
    if (aged) {
      beforeRename()
      val tomb = new Path(root, s".fenced-$g-" +
        java.util.UUID.randomUUID.toString.take(8))
      val renamed =
        try { fc.rename(p, tomb); true }
        catch { case _: java.io.IOException => false }
      if (renamed) {
        afterRename()
        if (fs.exists(new Path(root, s"$MarkerDir/$g")))
          restoreTombstone(fs, fc, root, g, tomb)
        else fs.delete(tomb, true)
      }
    }
  }

  /** Restore a tombstoned COMMITTED version to its `v=g` slot. The
    * restore can transiently fail only while a claimant is transiting
    * [[stageAndClaim]]'s check→rename window into the freed slot; the
    * marker-exclusion post-check forces every such claimant to VACATE,
    * so a bounded retry converges. If the marker disappears while we
    * retry, the "commit" was transient — the owner's post-commit token
    * check retracted it (the owner throws `fenced at commit`), the
    * tombstoned bytes were never visible to readers, and the tombstone
    * is reclaimed instead. Exhausting the retries means an interleaving
    * the protocol claims impossible — assert loudly (the r11 code
    * swallowed this failure, silently serving a claimant's uncommitted
    * bytes under the owner's marker; VERDICT r11 #1). */
  private def restoreTombstone(fs: org.apache.hadoop.fs.FileSystem,
                               fc: org.apache.hadoop.fs.FileContext,
                               root: Path, g: Int, tomb: Path): Unit = {
    val marker = new Path(root, s"$MarkerDir/$g")
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (!fs.exists(marker)) {
        fs.delete(tomb, true); done = true
      } else {
        try {
          fc.rename(tomb, new Path(root, s"v=$g"))
          // Local-fs rename can NEST the source inside a destination
          // that appeared in the check→rename window (the same HDFS-
          // semantics fallback stageAndClaim verifies against): if a
          // claimant occupied v=g mid-restore, our committed bytes are
          // now at v=g/<tombName> — pull them back out and retry (the
          // claimant's marker-exclusion vacate frees the slot).
          val nested = new Path(root, s"v=$g/${tomb.getName}")
          if (fs.exists(nested)) { fc.rename(nested, tomb); Thread.sleep(20L) }
          else done = true
        }
        catch {
          case e: java.io.IOException =>
            // Converged by another actor: vacuumVersions' tombstone
            // pass restores committed tombstones too — tomb gone with
            // v=g present is the healthy end state, not a failure.
            if (!fs.exists(tomb) && fs.exists(new Path(root, s"v=$g")))
              done = true
            else if (attempts >= 100) throw new IllegalStateException(
              s"fence restore of committed v=$g under $root kept failing " +
                s"— v=$g is occupied by data that never vacates, which " +
                "the marker-exclusion claim protocol makes impossible; " +
                s"the committed bytes are stranded at $tomb", e)
            else Thread.sleep(20L)
        }
      }
    }
  }

  /** Read the applied-batch ledger stamped into a version directory
    * (absent on tables never batch-keyed → empty). Lines are single
    * ids (`7`) or inclusive ranges (`3-9`) — see [[writeApplied]]. */
  private def appliedBatches(fs: org.apache.hadoop.fs.FileSystem,
                             root: Path, version: Int): Set[Long] = {
    val p = new Path(root, s"v=$version/$AppliedLedger")
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).getLines()
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { line =>
          line.split('-') match {
            case Array(a, b) if a.nonEmpty =>
              (for (lo <- a.toLongOption; hi <- b.toLongOption)
                yield (lo to hi).iterator).getOrElse(Iterator.empty)
            case _ => line.toLongOption.iterator
          }
        }.toSet
      finally in.close()
    }
  }

  /** Stamp the ledger into a STAGE directory (pre-claim, so it rides
    * the claim rename atomically — `_`-prefixed, invisible to parquet
    * readers). One small file per version, rewritten wholesale: ids
    * accumulate down the version chain because each publish stamps
    * (parent's ledger + its id) — so contiguous runs are COLLAPSED to
    * inclusive `lo-hi` ranges before writing. A checkpointed stream's
    * ids are monotonically contiguous, so its ledger stays ONE line
    * forever (O(1) metadata per publish, not O(batches)); only
    * genuinely sparse ad-hoc id sets pay per-gap lines. Exact-set
    * semantics are unchanged — ranges are an encoding, not a
    * max-watermark approximation (out-of-order ad-hoc ids stay
    * individually detectable). */
  private def writeApplied(fs: org.apache.hadoop.fs.FileSystem,
                           stageDir: Path, ids: Set[Long]): Unit = {
    val sorted = ids.toSeq.sorted
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { id =>
      // Negative ids stay singletons: `lo-hi` only parses unambiguously
      // when both bounds are non-negative (stream ids always are).
      if (id >= 0 && ranges.nonEmpty && ranges.last._1 >= 0 &&
          ranges.last._2 == id - 1)
        ranges(ranges.length - 1) = (ranges.last._1, id)
      else ranges += ((id, id))
    }
    val body = ranges
      .map { case (lo, hi) => if (lo == hi) s"$lo" else s"$lo-$hi" }
      .mkString("\n")
    val out = fs.create(new Path(stageDir, AppliedLedger), false)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
  }

  /** Ledger file name inside a version directory. */
  private val AppliedLedger = "_applied"

  /** True when a failure is rooted in (or reports) a missing data
    * file — the signature of a scan whose resolved files a
    * fence-restore transit moved mid-read. Spark wraps the underlying
    * FileNotFoundException in task/job failures whose cause chain is
    * sometimes flattened into the message, so both are checked. */
  private def missingFileRooted(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.isInstanceOf[java.io.FileNotFoundException] ||
          (t.getMessage != null &&
            t.getMessage.contains("FileNotFoundException")))
        return true
      t = t.getCause
    }
    false
  }

  /** Range-clustered layout: repartitionByRange + sortWithinPartitions
    * on the dominant filter column before writing, so every output file
    * covers a disjoint, internally-sorted value range. Parquet stores
    * per-row-group min/max stats; against this layout a range predicate
    * skips whole files/row groups at planning time, where a
    * hash-distributed layout forces every file open. The write costs
    * one range shuffle (sampled boundaries) — the standing-lake trade
    * of one layout pass for every future scan. The single-column
    * linearization is the practical subset of Z-ordering; multi-column
    * needs an interleaved key, same write shape. */
  def writeRangeLayout(df: DataFrame, path: String, sortCol: String,
                       files: Int): Unit =
    df.repartitionByRange(files, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** The multi-column completion of [[writeRangeLayout]]: cluster files
    * on a Z-ORDER (Morton) key so range predicates on ANY of the layout
    * columns — and especially on several at once — skip files via
    * parquet min/max stats. A single-column range layout makes each
    * file span the full domain of every OTHER column, so a 2-D box
    * predicate still opens every file matching dim 1; interleaving the
    * bits gives every file a small bounding box in all layout dims at
    * once (file count intersecting a box shrinks from O(selectivity·F)
    * to ~O(box-area·F)).
    *
    * Mechanics: each column is min/max-normalized to a 16-bit integer
    * (15-bit at 4 columns, keeping the interleave out of the sign bit;
    * the min/max pass is ONE compact aggregate collected to the
    * driver — 2·N scalars, not data); bit b of column i lands at
    * position b·N+i of the 63-bit z-value (so ≤ 4 columns); the write
    * is then exactly the range-layout shape — one sampled range
    * shuffle on z, sort within partitions, every task writes its own
    * file. The z column is dropped before writing: it is a LAYOUT
    * device, not data, and recomputable from the stats. Nulls
    * normalize to bucket 0 (they sort first, same as a plain sort
    * layout). Skew note: repartitionByRange samples the z
    * distribution, so value-heavy cells split across files instead of
    * pinning one writer. */
  def writeZOrderLayout(df: DataFrame, path: String, cols: Seq[String],
                        files: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && cols.size <= 4,
      s"z-order interleaves 16 bits per column into 64: 1-4 cols, got $cols")
    cols.foreach { c =>
      val f = df.schema(c)
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order layout column must be numeric (strings would all " +
          s"collapse to bucket 0): $c is ${f.dataType.simpleString}")
    }
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    if (row.getAs[Long]("n") == 0L) { // empty input: no stats to layout
      df.write.mode("overwrite").parquet(path) // on — write the empty
      return // dataset as-is, matching writeRangeLayout's behavior
    }
    // 15 bits/col at 4 cols keeps the top interleaved bit out of the
    // SIGN position (16·4 = 64 would put column 3's high bit at bit 63,
    // turning the upper half of its domain negative and wrapping the
    // Morton order at the signed sort boundary).
    val bits = if (cols.size == 4) 15 else 16
    val top = (1L << bits) - 1
    val z = zValue(cols.zipWithIndex.map { case (c, i) =>
      val mn = if (row.isNullAt(row.fieldIndex(s"mn_$c"))) 0.0
        else row.getAs[Double](s"mn_$c")
      val mx = if (row.isNullAt(row.fieldIndex(s"mx_$c"))) 0.0
        else row.getAs[Double](s"mx_$c")
      val span = if (mx > mn) mx - mn else 1.0
      // bucket in [0, 2^bits); nulls → 0 (sort first, like a plain sort)
      least(greatest(coalesce(
        ((col(c).cast("double") - mn) / span * top), lit(0.0)),
        lit(0.0)), lit(top.toDouble)).cast("long")
    }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Morton interleave of pre-bucketed `bits`-wide values: bit b of
    * input i → output bit b·N+i (N·bits ≤ 63 so the sign bit stays
    * clear). Unrolled into bits·N codegen-friendly shift/or terms — no
    * UDF, stays inside whole-stage codegen. */
  private def zValue(buckets: Seq[org.apache.spark.sql.Column],
                     bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = buckets.size
    require(n * bits <= 63, s"z-value would reach the sign bit: $n x $bits")
    val terms = for {
      (bk, i) <- buckets.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Atomic versioned publish — the missing piece between [[upsert]]'s
    * in-place swap and a standing corpus pipeline: each publish writes a
    * COMPLETE new version directory `v=<n>` and only then flips a
    * one-line `LATEST` pointer file (temp-file + rename — atomic on
    * HDFS-semantics filesystems; on object stores the pointer is a
    * single small object, last-writer-wins). Readers resolve the
    * pointer first, so they observe either the old version or the new
    * one — never a blend, never a half-written directory; a crash
    * mid-write leaves an unreferenced stage directory that
    * [[vacuumVersions]]' caller can reclaim, and version numbers only
    * move forward. This is the pattern transactional table formats
    * industrialize; at 100 TB the version directories share nothing, so
    * publish cost is one full write with zero read amplification and
    * rollback is re-pointing LATEST. Returns the published version.
    *
    * Concurrency (ADVICE r5): CONCURRENT PUBLISHERS ARE SAFE on
    * HDFS-semantics filesystems — each publisher writes its data into a
    * unique hidden stage directory, and the commit point is a
    * no-overwrite rename of that directory to `v=<n>`: the filesystem
    * grants each version number to exactly ONE publisher; a loser
    * observes the collision and retries the rename at the next free
    * number (its data is already written — the retry costs one metadata
    * op, no rewrite). Version directories therefore never blend. The
    * pointer is MONOTONIC BY CONSTRUCTION (ADVICE r6, hardened r7):
    * each publisher records its version as its OWN empty marker file
    * `_latest/<n>`, and readers resolve MAX(markers). File creations
    * commute — there is no shared pointer file to overwrite, so no
    * check-then-flip interleaving exists in which a race loser can
    * regress readers (the single-file re-read-then-rename this
    * replaces narrowed that race but could not close it: a loser
    * whose overwrite landed last still parked readers on the older
    * version). Rollback = delete the newer markers. Legacy tables
    * carrying only a one-line `LATEST` file still resolve (fallback
    * read); their next publish writes a marker and the table is
    * migrated. */
  def publishVersioned(df: DataFrame, tableDir: String): Int = {
    val claim = stageAndClaim(df, tableDir)
    commitMarker(df.sparkSession, tableDir, claim)
    claim.version
  }

  /** A claimed-but-unmarked version: the number the filesystem granted
    * plus the publisher-owned token stamped INSIDE the staged data
    * before the claim rename (so it travels with the directory). The
    * token is what lets [[commitMarker]] distinguish "my data still
    * sits at v=n" from "v=n was orphan-fenced and/or re-claimed by a
    * competitor while I stalled" — the two are indistinguishable by
    * version number alone. */
  private[graft] final case class Claim(version: Int, token: String)

  /** The first half of [[publishVersioned]]: stage the data and claim a
    * version NUMBER (no-overwrite rename — the filesystem grants each
    * number to exactly one publisher), WITHOUT the marker. The claimed
    * version is INVISIBLE to readers until [[commitMarker]] — which is
    * what lets [[mergePublish]] validate its merge base between claim
    * and commit, and retract a stale claim without any reader ever
    * having observed it.
    *
    * MARKER EXCLUSION (r12, closes the VERDICT-r11 triple race): a
    * claim is refused on any number whose COMMIT MARKER already exists
    * — checked before each rename attempt and re-checked after the
    * rename lands. The state the check makes unrepresentable: a
    * fencer tombstones v=g, the (fully committed) owner's marker for g
    * is present, and a fresh claimant grabs the freed v=g slot before
    * the fencer's restore — readers resolving max-marker would then
    * serve the claimant's UNCOMMITTED bytes under the owner's marker.
    * The pre-check skips marker-carrying numbers without an attempt;
    * the post-check covers a marker that landed inside the
    * check→rename window by VACATING (renaming our data back to a
    * fresh stage name and moving to the next number), after which the
    * fencer's restore retry finds the slot free ([[restoreTombstone]]).
    * `stamp` runs against the staged directory after the data write
    * and before the claim rename — metadata files written there (the
    * applied-batch ledger) travel with the version atomically.
    * `beforeRename` is the spec seam for injecting a marker into the
    * check→rename window deterministically. */
  private[graft] def stageAndClaim(df: DataFrame, tableDir: String,
                                   stamp: Path => Unit = _ => (),
                                   beforeRename: Int => Unit = _ => (),
                                   afterRename: Int => Unit = _ => ())
      : Claim = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tableDir)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)
    def freshStage() = new Path(root,
      s".stage-${java.util.UUID.randomUUID.toString.take(8)}")
    val token = java.util.UUID.randomUUID.toString
    var stage: Path = null
    def restage(): Unit = {
      stage = freshStage()
      // A failed stage write (e.g. the merge's base read raced a
      // fence-restore transit) must not leave partial debris for the
      // soak's hygiene or grow the root until vacuum: reap and rethrow.
      try df.write.mode("errorifexists").parquet(stage.toString)
      catch { case e: Throwable => fs.delete(stage, true); throw e }
      stamp(stage)
      // Claim token: stamped into the staged dir BEFORE the rename, so
      // ownership travels with the data. `_`-prefixed → invisible to
      // parquet readers, same convention as _SUCCESS.
      fs.create(new Path(stage, s"_claim-$token"), false).close()
    }
    restage()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
    // Claims start at COMMITTED max + 1, not at max(existing dirs)+1:
    // a retracted claim leaves an empty number below the live claims
    // above it, and dir-derived numbering then never returns to fill
    // the hole — every publisher claims above it, finds the hole in
    // its adjacency gap (neither committed nor zombie), retracts, and
    // re-claims above it again, a mutual starvation observed at 4
    // writers as 65 lost rounds over root {v=1,v=2,v=4,v=5; markers
    // 1,2}. Walking up from the committed base instead restores the
    // lock-free progress guarantee: whoever holds base+1 either
    // commits (progress) or retracts (freeing base+1 for the next
    // claimant); occupied or marker-excluded numbers are skipped by
    // the existing rename/exclusion logic. Tables with no markers yet
    // (bootstrap or legacy LATEST) keep the dir-derived start.
    // The start is the SERVABLE current + 1 (not the max marker —
    // a crashed-commit zombie above the servable base would skip the
    // genuinely free next number); the walk skips marker-excluded and
    // occupied numbers from there. All-zombie marker sets fall back
    // to the max marker, bootstrap/legacy tables to the dir max.
    val markerMax =
      if (fs.exists(new Path(root, MarkerDir)))
        fs.listStatus(new Path(root, MarkerDir)).toSeq
          .flatMap(_.getPath.getName.toIntOption).foldLeft(0)(math.max)
      else 0
    var next =
      if (markerMax > 0)
        (try currentVersion(fs, root)
         catch { case _: IllegalStateException => markerMax }) + 1
      else 1 + listVersions(fs, root).foldLeft(0)(math.max)
    var claimed = -1
    var slotAttempts = 0
    while (claimed < 0) {
      if (fs.exists(new Path(root, s"$MarkerDir/$next"))) {
        // Marker exclusion pre-check: the number is COMMITTED (its
        // data may be transiting a fence tombstone) — never claimable.
        next += 1
      } else {
        beforeRename(next)
        try {
          // Rename.NONE: fails if the destination exists — the claim on
          // this version number.
          fc.rename(stage, new Path(root, s"v=$next"),
            org.apache.hadoop.fs.Options.Rename.NONE)
          // A successful rename return is NOT a claim on the local fs:
          // RawLocalFileSystem.rename falls back to HDFS directory
          // semantics when the destination came into existence inside
          // FileContext's check→rename window — it moves the source
          // INTO the existing destination as a CHILD and returns true.
          // Forensically observed: a loser's stage nested at
          // v=N/.stage-*, the loser proceeding as if it owned v=N, and
          // its commitMarker later failing "fenced" (or worse,
          // committing a marker over the winner's bytes). Ownership is
          // therefore verified by the claim token at the TOP level of
          // the slot; a nested loser recovers its bytes (or restages
          // if the winner's retract already swept them away) and moves
          // to the next number.
          val vdir = new Path(root, s"v=$next")
          if (!fs.exists(new Path(vdir, s"_claim-$token"))) {
            val nested = new Path(vdir, stage.getName)
            val back = freshStage()
            val recovered =
              try { fc.rename(nested, back); true }
              catch { case _: java.io.IOException => false }
            if (recovered) stage = back else restage()
            next += 1
          } else {
          afterRename(next)
          if (fs.exists(new Path(root, s"$MarkerDir/$next"))) {
            // Marker landed inside the check→rename window: the number
            // is committed and its owner's data is in a fence
            // tombstone awaiting restore. Vacate the slot (our data
            // keeps its token — the rename moves the whole dir) and
            // try the next number. A failed vacate rename must not
            // propagate (an unretracted claim would wedge every later
            // publisher's adjacency until the fence age): if our token
            // is gone with it, restage and move on.
            var vacated = false
            var vacateTries = 0
            while (!vacated) {
              vacateTries += 1
              val back = freshStage()
              try {
                fc.rename(new Path(root, s"v=$next"), back,
                  org.apache.hadoop.fs.Options.Rename.NONE)
                stage = back; vacated = true
              } catch {
                case e: java.io.IOException =>
                  // Slot already empty (someone moved it with our
                  // bytes): restage. Still ours: the vacate MUST
                  // complete — abandoning it would orphan the slot
                  // and wedge adjacency until the fence age.
                  if (!fs.exists(new Path(root, s"v=$next/_claim-$token"))) {
                    restage(); vacated = true
                  } else if (vacateTries > 16) throw e
                  else Thread.sleep(10L)
              }
            }
            next += 1
          } else claimed = next
          }
        } catch {
          // ANY rename failure is a lost slot race, not an error to
          // propagate: the typed FileAlreadyExistsException (dst
          // existed at FileContext's check), ENOTEMPTY (dst landed
          // between check and rename(2)), and — observed in soak —
          // Shell chmod ExitCodeExceptions from the local fs's
          // HDFS-semantics fallback, which COPIES the source file by
          // file into an existing destination and crashes mid-copy
          // when the slot's winner vacates or retracts underneath it.
          // A post-hoc exists(dst) probe cannot disambiguate (the
          // winner may already be gone), so the policy is: verify our
          // stage survived (a failed fallback copy can consume it —
          // restage from the DataFrame if the token file is missing),
          // move to the next number, and let the slot-attempts cap
          // bound genuinely persistent I/O failure.
          case e: java.io.IOException =>
            slotAttempts += 1
            if (slotAttempts > 64) throw e
            if (!fs.exists(new Path(stage, s"_claim-$token"))) restage()
            next += 1
        }
      }
    }
    Claim(claimed, token)
  }

  /** The second half of [[publishVersioned]]: record the version's
    * marker — the commit point readers resolve. Creating a fresh file
    * per publisher commutes with every concurrent publish, so the
    * resolved pointer (max over markers) never moves backward.
    *
    * Fence detection (ADVICE r10): a publisher stalled past the orphan
    * fence age between claim and here may find its version deleted (a
    * competitor fenced it) or re-claimed with a competitor's data —
    * committing blindly would either strand readers on a dangling
    * marker or report success for a silently-discarded batch. The
    * claim TOKEN closes both: verify it before the marker create
    * (catches any fence that completed first — the fence renames the
    * dir away as its FIRST op, so a fenced dir cannot still carry the
    * token), and re-verify after (catches a fence that read "unmarked"
    * just before our marker landed; we retract the marker and fail).
    * After a successful post-check, any later fencer sees the marker
    * either at its age gate or at its own post-rename re-check and
    * restores — so "commitMarker returned" really means "readers will
    * resolve this version". Failure is an IllegalStateException, never
    * a silent success: the caller's batch was NOT published and must
    * be replayed (the merge paths converge on replay by design). */
  private[graft] def commitMarker(spark: SparkSession, tableDir: String,
                                  claim: Claim): Unit =
    commitMarkerWith(spark, tableDir, claim)

  /** [[commitMarker]] with the spec seam exposed: `beforeMarker` runs
    * after the token pre-check and before the marker create — the
    * exact window in which a fence arriving mid-commit produces the
    * "fenced at commit" retract-and-throw path, which no wall-clock
    * interleaving reaches deterministically. */
  private[graft] def commitMarkerWith(spark: SparkSession, tableDir: String,
                                      claim: Claim,
                                      beforeMarker: () => Unit = () => ())
      : Unit = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tokenPath =
      new Path(root, s"v=${claim.version}/_claim-${claim.token}")
    def fenced(when: String): Nothing = {
      // Forensic snapshot: the states that distinguish the possible
      // mechanisms (fence tombstone vs vacate vs foreign occupation).
      def ls(p: Path): String =
        try fs.listStatus(p).map(_.getPath.getName).sorted.mkString(",")
        catch { case _: java.io.IOException => "<unlistable>" }
      throw new IllegalStateException(
        s"publish fenced $when: v=${claim.version} under $tableDir no " +
          s"longer carries claim token ${claim.token} — this publisher " +
          "stalled past the orphan fence age and the version was " +
          "reclaimed; the batch was NOT published, replay it " +
          s"[root: ${ls(root)}; v-dir: " +
          s"${ls(new Path(root, s"v=${claim.version}"))}; markers: " +
          s"${ls(new Path(root, MarkerDir))}]")
    }
    if (!fs.exists(tokenPath)) fenced("before commit")
    beforeMarker()
    fs.mkdirs(new Path(root, MarkerDir))
    // The marker NAMES its claim token (r12): readers verify the slot
    // still carries `_claim-<token>` before serving, which closes the
    // transient read-uncommitted window in which a claimant occupies a
    // freed committed slot between its rename and its marker-re-check
    // vacate — under a token-verified marker, foreign bytes are never
    // servable, not merely never PERSISTENTLY servable. (The
    // create→write is not atomic; a reader catching the marker empty
    // falls back to the legacy dir-exists rule — the pre-r12 behavior,
    // and the window is two metadata ops wide.)
    val out = fs.create(new Path(root, s"$MarkerDir/${claim.version}"), false)
    try out.write(claim.token.getBytes("UTF-8")) finally out.close()
    if (!fs.exists(tokenPath)) {
      fs.delete(new Path(root, s"$MarkerDir/${claim.version}"), false)
      fenced("at commit")
    }
  }

  /** The reader-side servability test for one marker: its data
    * directory exists AND — when the marker file names a claim token
    * (r12) — the directory still carries that token, so a claimant
    * transiting a freed committed slot can never be served as the
    * committed version. Tokenless (legacy / mid-write) markers fall
    * back to the dir-exists rule. One small-file read per candidate;
    * resolution normally checks a single marker. */
  private def servableVersion(fs: org.apache.hadoop.fs.FileSystem,
                              root: Path, v: Int): Boolean =
    fs.exists(new Path(root, s"v=$v")) && {
      val tok =
        try {
          val in = fs.open(new Path(root, s"$MarkerDir/$v"))
          try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        } catch { case _: java.io.IOException => "" }
      tok.isEmpty || fs.exists(new Path(root, s"v=$v/_claim-$tok"))
    }

  /** Directory of per-version publish markers; `_`-prefixed so Spark's
    * partition discovery ignores it next to the `v=<n>` dirs. */
  private val MarkerDir = "_latest"

  /** Resolve the LATEST pointer and read that version (an unreferenced
    * higher `v=` from a crashed publish is invisible here). */
  def readLatest(spark: SparkSession, tableDir: String): DataFrame = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$tableDir/v=${currentVersion(fs, root)}")
  }

  /** Read one specific published version (time travel over the
    * [[publishVersioned]] layout). */
  def readVersion(spark: SparkSession, tableDir: String, version: Int): DataFrame =
    spark.read.parquet(s"$tableDir/v=$version")

  /** TIME-based time travel (r12): the version current AS OF
    * `atMillis`. A marker file is created at the commit instant and
    * never modified, so its mtime IS the version's commit timestamp —
    * the version as of t is max{v : marker-mtime(v) ≤ t}, resolved
    * from the same marker listing [[readLatest]] uses (one directory
    * listing, no data touched). Monotone: markers only accumulate, so
    * the same t always resolves the same version until vacuum reclaims
    * it (fails loudly then — a reclaimed version cannot be served).
    * Caveat for cross-machine readers: mtimes carry the NAMENODE/store
    * clock, the usual caveat of timestamp-based travel (table formats
    * embed commit times in their log for the same reason, with the
    * same trust model). */
  def versionAt(spark: SparkSession, tableDir: String,
                atMillis: Long): Int = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md = new Path(root, MarkerDir)
    val committed =
      if (!fs.exists(md)) Nil
      else fs.listStatus(md).toSeq
        .flatMap(st => st.getPath.getName.toIntOption
          .map(v => v -> st.getModificationTime))
    // Same servable rule as [[readLatest]]'s resolution (r12): a marker
    // with no data directory — fence-restore transit or crashed-commit
    // zombie — or whose directory no longer carries the marker's claim
    // token (a claimant transiting the freed slot) is skipped, serving
    // the newest committed version at or before t that actually has
    // its own bytes.
    val asOf = committed.filter { case (v, m) =>
      m <= atMillis && servableVersion(fs, root, v) }.map(_._1)
    require(asOf.nonEmpty,
      s"no servable version of $tableDir as of $atMillis — either before " +
        "the first commit, or vacuumed past the retention window " +
        "(earliest surviving marker: " +
        s"${committed.map(_._2).minOption.getOrElse("none")}; widen " +
        "vacuumVersions' keepLast to serve travel this far back)")
    asOf.max
  }

  /** [[readVersion]] at the version [[versionAt]] resolves. */
  def readAsOf(spark: SparkSession, tableDir: String,
               atMillis: Long): DataFrame =
    readVersion(spark, tableDir, versionAt(spark, tableDir, atMillis))

  /** Keyed diff of two published versions — the review artifact for a
    * versioned corpus ("what did this rebuild actually change?"):
    * one row per key whose state differs, `change` ∈ added / removed /
    * changed (any non-key column differs; unchanged keys are absent —
    * at 100 TB the diff output is proportional to the CHANGE, not the
    * corpus). Requires key-unique versions (the [[upsert]] contract).
    * Shape: one full-outer join shuffle-keyed on the keys; both sides
    * are plain version-directory scans with pushdown; null-safe
    * struct equality (<=>) classifies in the join's own projection, so
    * the whole diff is one exchange round. */
  def diffVersions(spark: SparkSession, tableDir: String,
                   oldVersion: Int, newVersion: Int,
                   keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = readVersion(spark, tableDir, oldVersion)
    val n = readVersion(spark, tableDir, newVersion)
    // Names AND types: a type migration (score INT → BIGINT) with
    // matching names must fail fast here, not as a confusing struct
    // comparison error downstream.
    require(o.dtypes.sortBy(_._1).sameElements(n.dtypes.sortBy(_._1)),
      s"schema drift between v=$oldVersion and v=$newVersion — diff by " +
        "key is ill-defined; handle migrations explicitly")
    // ADVICE r6: the diff's internal columns would silently collide
    // with same-named DATA columns (a table already carrying `change`
    // makes the classification ambiguous-or-wrong) — fail fast. Fixed
    // names + require beats uniqufied names: the output contract
    // (`change`) stays stable and documented.
    val reserved =
      Seq("old_vals", "new_vals", "old_present", "new_present", "change")
    val clash = o.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"diffVersions reserves column name(s) ${clash.mkString(", ")} — " +
        "rename them in the table (or diff a projection) first")
    val valueCols = o.columns.filterNot(keys.contains).sorted.toIndexedSeq
    def tagged(df: DataFrame, tag: String) =
      df.select(keys.map(col) ++
        Seq(struct(valueCols.map(col): _*).as(s"${tag}_vals"),
          lit(1).as(s"${tag}_present")): _*)
    tagged(o, "old").join(tagged(n, "new"), keys.toIndexedSeq, "full_outer")
      .withColumn("change",
        when(col("old_present").isNull, lit("added"))
          .when(col("new_present").isNull, lit("removed"))
          .when(!(col("old_vals") <=> col("new_vals")), lit("changed")))
      .where(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** Roll the table back to `version`: delete every marker ABOVE it,
    * so readers resolve `version` again — the operation the marker
    * pointer makes a pure metadata delete (no data moves; the rolled-
    * back version directories survive for diffing/forensics until
    * [[vacuumVersions]] reclaims below the new current). Fails fast if
    * `version` was never published or its directory is gone (a
    * rollback must land on a COMPLETE version, the invariant markers
    * encode). Legacy tables (LATEST file, no markers) migrate: the
    * target's marker is created, then the stale LATEST file is removed
    * so marker resolution takes over. */
  def rollbackTo(spark: SparkSession, tableDir: String, version: Int): Unit = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(root, s"v=$version")),
      s"cannot roll back to v=$version under $root — no such version " +
        "directory (vacuumed, or never published)")
    fs.mkdirs(new Path(root, MarkerDir))
    if (!fs.exists(new Path(root, s"$MarkerDir/$version")))
      fs.create(new Path(root, s"$MarkerDir/$version"), false).close()
    fs.listStatus(new Path(root, MarkerDir)).toSeq
      .flatMap(st => st.getPath.getName.toIntOption.map(st.getPath -> _))
      .filter(_._2 > version)
      .foreach { case (p, _) => fs.delete(p, false) }
    fs.delete(new Path(root, "LATEST"), false)
  }

  /** Drop version directories below the pointed-to one, RETAINING the
    * `keepLast` newest of them as the time-travel window (r12 — the
    * scaladoc always said the window is the caller's policy; now the
    * API has the knob: keepLast = 0 keeps only the current version,
    * keepLast = 3 serves [[readAsOf]]/[[rollbackTo]] three versions
    * back). The pointed version and any NEWER unreferenced one — a
    * publish may be in flight — always survive. Vacuumed versions lose
    * their publish markers too, so a later "rollback by deleting newer
    * markers" can never point at a reclaimed directory. Returns the
    * versions removed.
    *
    * Fence-tombstone reaping (r12, VERDICT r11 #4): a fencer that
    * crashed mid-fence leaves a hidden `.fenced-g-*` directory — on a
    * contended table, unbounded garbage this retention pass must
    * reclaim. Disposition by the marker invariant: marker g present
    * with `v=g` missing means the tombstone holds the ONLY copy of a
    * COMMITTED version (the fencer died between rename and restore) —
    * complete the restore; any other state means the bytes were never
    * committed or are already served from `v=g` — delete. The
    * tombstone pass runs FIRST so a restored version participates in
    * the normal retention sweep below. */
  def vacuumVersions(spark: SparkSession, tableDir: String,
                     keepLast: Int = 0,
                     zombieGraceMs: Long = 600000L): Seq[Int] = {
    require(keepLast >= 0, s"keepLast must be >= 0, got $keepLast")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".fenced-"))
      .foreach { st =>
        val g = st.getPath.getName.stripPrefix(".fenced-")
          .takeWhile(_ != '-').toIntOption
        val marked = g.exists(v => fs.exists(new Path(root, s"$MarkerDir/$v")))
        val restorable = marked &&
          g.exists(v => !fs.exists(new Path(root, s"v=$v")))
        // A MARKED tombstone whose slot is occupied is a vacating
        // claimant in transit (marker exclusion forces it out): leave
        // the committed bytes for the fencer's bounded retry or the
        // next vacuum — deleting here would destroy the only copy of a
        // committed version. Only UNMARKED tombstones (crashed-fence
        // debris of uncommitted claims) are reclaimed.
        if (restorable) fs.rename(st.getPath, new Path(root, s"v=${g.get}"))
        else if (!marked) fs.delete(st.getPath, true)
      }
    // Zombie-marker reap (r12): a publisher that crashed inside
    // commitMarker's create→post-check window — after its unmarked
    // claim had been fenced and deleted — leaves a marker with no data
    // directory. It is no version at all (nothing was ever readable
    // there); readers skip it and marker exclusion blocks its number,
    // but left in place it pins a dead number forever. The reap is
    // AGE-GATED (`zombieGraceMs`): a fence-restore transit also shows
    // marker ∧ no-directory for the duration of two renames, and
    // reaping a transit's marker would make the fencer's re-check
    // misread its committed tombstone as reclaimable — a marker this
    // old with no data, no tombstone (re-checked per marker against a
    // fresh listing), and no restore in flight is genuinely dead. The
    // residual window — a fencer stalled past the grace between its
    // rename and its re-check — is the same stall class orphanFenceMs
    // already bounds, and the restore's convergence check tolerates a
    // vacuum completing the restore first.
    val md = new Path(root, MarkerDir)
    val reapNow = System.currentTimeMillis()
    if (fs.exists(md)) fs.listStatus(md).toSeq
      .flatMap(st => st.getPath.getName.toIntOption
        .map(v => (st.getPath, v, st.getModificationTime)))
      .filter { case (_, v, m) =>
        reapNow - m > zombieGraceMs &&
          !fs.exists(new Path(root, s"v=$v")) &&
          !fs.listStatus(root).exists(
            _.getPath.getName.startsWith(s".fenced-$v-")) }
      .foreach { case (p, _, _) => fs.delete(p, false) }
    // Crash-debris reap: `.stage-*` (publisher died mid-stage, never
    // claimed) and `.retract-*` (died between the retract rename and
    // its delete) are publisher-private dirs no reader or claimant
    // ever references — age-gated only so a LIVE publisher's
    // in-flight stage is never pulled out from under it.
    fs.listStatus(root).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isDirectory &&
          (n.startsWith(".stage-") || n.startsWith(".retract-")) &&
          reapNow - s.getModificationTime > zombieGraceMs }
      .foreach(s => fs.delete(s.getPath, true))
    val current = currentVersion(fs, root)
    // Keep the `keepLast` NEWEST below current (by version number, not
    // arithmetic — committed numbers need not be contiguous).
    val old = listVersions(fs, root).filter(_ < current).sorted
      .dropRight(keepLast)
    old.foreach { v =>
      fs.delete(new Path(root, s"v=$v"), true)
      fs.delete(new Path(root, s"$MarkerDir/$v"), false)
    }
    old
  }

  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
                           root: Path): Seq[Int] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .flatMap(s => s.getPath.getName.stripPrefix("v=").toIntOption)

  /** The version readers RESOLVE: the highest marker whose data
    * directory EXISTS. A marker with no `v=<n>` directory is skipped —
    * two transients produce one: a fence→restore transit (the
    * committed bytes sit in a tombstone for the duration of two
    * renames) and a ZOMBIE marker from a publisher that crashed (or
    * was descheduled) inside commitMarker's create→post-check window
    * after its unmarked claim had been fenced and deleted (r12 —
    * observed as a reader PATH_NOT_FOUND flake under suite-load
    * stalls: the zombie marker resolved as current and the read
    * exploded on a path that never carried committed data). Skipping
    * serves the previous committed snapshot — a consistent read —
    * and the marker-exclusion claim check keeps the skipped number
    * unclaimable, so nothing foreign can ever appear under it;
    * [[vacuumVersions]] reaps permanent zombies so the skip list
    * cannot grow without bound. */
  private def currentVersion(fs: org.apache.hadoop.fs.FileSystem,
                             root: Path): Int = {
    val md = new Path(root, MarkerDir)
    val markers =
      if (fs.exists(md))
        fs.listStatus(md).toSeq.flatMap(_.getPath.getName.toIntOption)
      else Nil
    val servable = markers.sorted(Ordering[Int].reverse)
      .find(v => servableVersion(fs, root, v))
    if (servable.nonEmpty) servable.get
    else if (markers.nonEmpty) throw new IllegalStateException(
      s"markers exist under $root but none has a data directory — every " +
        "version is in a fence-restore transit or is a crashed-commit " +
        "zombie; retry, or run vacuumVersions to reap zombies and " +
        "complete crashed restores")
    else {
      // Legacy single-file pointer (pre-r7 tables): resolve it so an
      // existing deployment keeps reading; the next publish writes a
      // marker and the table migrates forward.
      val ptr = new Path(root, "LATEST")
      require(fs.exists(ptr),
        s"no publish marker or LATEST pointer under $root — never published?")
      val in = fs.open(ptr)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      txt.toInt
    }
  }

  /** Adopt a FLAT-layout table into the `batch_id=N`-keyed layout the
    * streaming maintenance writes (r7 review): every non-hidden child
    * of `dir` that is not already a `batch_id=` partition — root-level
    * part files for pair/signature tables, `cell=*` dirs for IVF
    * postings — moves under `batch_id=-1/` (the pre-stream history).
    * Without this, a batch-keyed write next to flat children makes the
    * WHOLE directory unreadable ("conflicting directory structures" at
    * partition discovery). Metadata-only renames; idempotent (a replay
    * finds nothing left to move, a crash mid-move resumes on the next
    * call). Run at stream-attach time, quiesced — concurrent readers
    * during adoption may see a partial view, the same caveat as the
    * compact/upsert directory swaps. */
  def adoptFlatLayout(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val kids = fs.listStatus(root).toSeq.filterNot { st =>
      val n = st.getPath.getName
      n.startsWith("batch_id=") || n.startsWith("_") || n.startsWith(".")
    }
    if (kids.nonEmpty) {
      val legacy = new Path(root, "batch_id=-1")
      fs.mkdirs(legacy)
      kids.foreach(st =>
        fs.rename(st.getPath, new Path(legacy, st.getPath.getName)))
    }
  }

  /** F8: mint a landed-object name `<table>_<yyyyMMdd>_<uuid4-prefix>.<ext>`
    * (`cloud_function/create_campaigns/csv/main.py:17-21`). */
  def mintObjectName(table: String, ext: String,
                     date: java.time.LocalDate = java.time.LocalDate.now()): String = {
    val ymd = date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    val suffix = java.util.UUID.randomUUID().toString.take(4)
    s"${table}_${ymd}_$suffix.$ext"
  }
}
