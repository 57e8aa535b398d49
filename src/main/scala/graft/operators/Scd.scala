package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 building: turn a change stream into
  * a versioned dimension with half-open validity windows — the
  * warehouse-modeling op a medallion pipeline grows into the moment a
  * dimension's history matters (the reference's master/business layers
  * overwrite attributes in place; SCD2 is the standard upgrade path).
  *
  * Semantics (the classic contract):
  *   - consecutive duplicates are SUPPRESSED — a version begins only
  *     when the tracked attribute actually changes;
  *   - version n is valid over [its change ts, next change ts) — the
  *     half-open windows of one key tile its timeline exactly, no gaps,
  *     no overlaps (ScdSpec pins both, plus point-in-time reconstruction
  *     against a brute-force scan);
  *   - the open current version carries NULL `valid_to_us` and
  *     `is_current = true`.
  *
  * Scale shape: everything is per-key windows over the KEY-partitioned
  * stream — one hash exchange on user_id; the change filter, the
  * validity lead() and the version row_number() all share that one
  * partitioning (same key, same ordering → Spark plans a single
  * exchange + sort). No global window, no self-join: history build over
  * 100 TB of changes is one shuffle of the change columns. Ordering is
  * total — ties on ts break by the unique event_id — so the build is
  * deterministic and the DuckDB twin reproduces it bit-for-bit. */
object Scd {

  /** Core builder over a change stream of
    * `(user_id, event_id, status, ts_us)`. The returned dim KEEPS the
    * `event_id` of the event that opened each version — the tie-break
    * [[scd2Apply]] needs to merge deterministically; the public
    * [[scd2]] contract drops it. */
  private[graft] def scd2FromChanges(stream: DataFrame): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    // High-water of ABSORBED events (r12): the open version's
    // `last_seen_us` is the max raw ts the key has ever seen —
    // including suppressed duplicates, whose ts the version rows
    // otherwise discard. It exists so [[scd2Apply]]'s late-slice guard
    // can reject events that would interleave BEFORE a suppressed
    // duplicate (undetectable from valid_from alone); closed versions
    // carry NULL (only the open version can absorb new events). Same
    // partition key as the other windows — no extra exchange.
    val keySpan = Window.partitionBy(col("user_id"))
    val changes = stream
      .withColumn("prev_status", lag(col("status"), 1).over(byTs))
      .withColumn("key_last_ts", max(col("ts_us")).over(keySpan))
      .where(col("prev_status").isNull ||
        col("prev_status") =!= col("status"))
      .drop("prev_status")
    // Same partition key AND ordering as the change filter's window →
    // the second/third window functions reuse the one exchange+sort.
    changes
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(byTs))
      .withColumn("version_no", row_number().over(byTs))
      .select(col("user_id"), col("version_no"), col("status"),
        col("event_id"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"),
        when(col("valid_to_us").isNull, col("key_last_ts"))
          .as("last_seen_us"))
  }

  /** The fixture change stream: each user's event_type plays the
    * tracked dimension attribute ("status"). */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    scd2FromChanges(changeStream(spark, dir))
      .drop("event_id", "last_seen_us")

  /** Sentinel status a CDC DELETE maps to inside the build — chosen
    * outside any plausible real status domain (space-prefixed), never
    * present in the returned dim. */
  private[graft] val Deleted = " __deleted__"

  /** SCD2 build over a DELETE-CARRYING CDC stream (r13, the dimension
    * completion of [[graft.sinks.Sinks.mergePublishCdc]]): rows carry
    * an I/U/D `opCol`; a D at ts T CLOSES the key's open version at T
    * and opens nothing — the key has no current row until a later
    * event re-opens one (and a re-statement of the pre-delete status
    * after a delete IS a new version: the key was absent in between).
    * Mechanics: deletes become a sentinel status, the standard build
    * runs unchanged (the sentinel closes its predecessor via the same
    * lead()), and sentinel versions are dropped with the surviving
    * versions densely renumbered — `version_no` counts LIVE versions.
    * Same one-exchange scale shape as [[scd2FromChanges]]. */
  def scd2FromCdc(stream: DataFrame, opCol: String = "op"): DataFrame = {
    dropDeleted(scd2FromChanges(mapCdcOps(stream, opCol)))
  }

  /** Map the op column into the status channel (D → sentinel), failing
    * fast on NULL/unknown ops — the [[graft.sinks.Sinks.mergePublishCdc]]
    * guard, for the same reason (a typo'd op must not silently change
    * history). */
  private def mapCdcOps(stream: DataFrame, opCol: String): DataFrame = {
    require(stream.columns.contains(opCol),
      s"scd2 CDC build: no operation column '$opCol' " +
        s"(columns: ${stream.columns.mkString(", ")})")
    // NULL status on an I/U is invalid too (r13 review): it would open
    // a NULL version that dropDeleted's null-hostile `=!=` then
    // silently filters — a NULL-status insert behaving as a delete.
    // The probe scans two pruned columns.
    val bad = stream.select(col(opCol), col("status"))
      .where(col(opCol).isNull ||
        !upper(col(opCol)).isin("I", "U", "D") ||
        (upper(col(opCol)) =!= "D" && col("status").isNull))
    if (!bad.isEmpty)
      throw new IllegalArgumentException(
        s"scd2 CDC build: operation column '$opCol' carries NULL or " +
          "values outside I/U/D, or an I/U row carries a NULL status")
    stream.select(col("user_id"), col("event_id"),
      when(upper(col(opCol)) === "D", lit(Deleted))
        .otherwise(col("status")).as("status"),
      col("ts_us"))
  }

  /** The late-slice guard shared by [[scd2Apply]] and [[scd2ApplyCdc]]:
    * reject any slice carrying an event older than an affected key's
    * open-version high-water (version compression cannot resurrect
    * suppressed duplicates — such keys must rebuild from raw history).
    * Keys WITHOUT an open version (deleted) are ungoverned here by
    * construction: any later event is a fresh opener. */
  private def assertNotLate(dim: DataFrame, newChanges: DataFrame): Unit = {
    // The guard only governs keys the SLICE touches — restrict the dim
    // to them before any aggregate (ADVICE r13: the deleted-keys arm
    // used to groupBy the ENTIRE dim per apply, a dim-wide shuffle in
    // an engine whose documented scale shape is one exchange per
    // apply). The semi-join prunes both arms to O(touched history);
    // the late-check join below was keyed on user_id anyway, so the
    // restriction is semantics-preserving on both the CDC and plain
    // paths.
    val touched = dim.join(newChanges.select(col("user_id")).distinct(),
      Seq("user_id"), "left_semi")
    val hw =
      if (dim.columns.contains("last_seen_us"))
        coalesce(col("last_seen_us"), col("valid_from_us"))
      else col("valid_from_us") // legacy dim without the high-water
    val open = touched.where(col("is_current"))
      .select(col("user_id"), hw.as("open_hw_us"))
    // DELETED keys (r13 review): no open version carries their
    // high-water, but an event older than the DELETION INSTANT can
    // still resurrect a pre-delete suppressed duplicate through the
    // replay. The deletion instant is the key's max valid_to (no
    // absorbed event can postdate it — anything later would have
    // re-opened the key), so it is the exact high-water. Keys with any
    // open version fall out of this arm (the open-version arm governs
    // them); non-CDC dims have every key open, leaving this arm empty.
    val deletedHw = touched.groupBy(col("user_id"))
      .agg(max(when(col("is_current"), 1).otherwise(0)).as("__any_open"),
        max(col("valid_to_us")).as("__del_hw"))
      .where(col("__any_open") === 0)
      .select(col("user_id"), col("__del_hw").as("open_hw_us"))
    val guard = open.unionByName(deletedHw)
    val late = newChanges
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("min_ts_us"))
      .join(guard, Seq("user_id"))
      .where(col("min_ts_us") < col("open_hw_us"))
    val sample = late.select(col("user_id"), col("min_ts_us"),
      col("open_hw_us")).take(3)
    require(sample.isEmpty,
      "scd2Apply: LATE changes for key(s) " +
        sample.map(r => s"${r.get(0)} (ts ${r.get(1)} < open version " +
          s"high-water ${r.get(2)})").mkString("; ") +
        " — a slice must be append-only per key (version compression " +
        "cannot resurrect suppressed duplicates); rebuild those keys " +
        "from raw history via scd2FromChanges instead")
  }

  /** Drop sentinel (deleted) versions and renumber the survivors
    * densely — the shared tail of the CDC build and the CDC apply, so
    * their bit-identity cannot drift. The renumber window shares the
    * build's partition key (one exchange end to end). */
  private def dropDeleted(dim: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("event_id"))
    dim.where(col("status") =!= Deleted)
      .withColumn("version_no", row_number().over(byKey))
  }

  /** Incremental CDC apply (the [[scd2Apply]] affected-keys rebuild,
    * delete-aware): touched keys replay their live versions as changes
    * PLUS a reconstructed tombstone at every GAP — wherever a version
    * closes and the next version (if any) does not open at that same
    * instant. In a dim built by this family a gap can only mean a
    * deletion (normal status changes tile: valid_to == next
    * valid_from), and the gap's left edge IS the deletion instant.
    * Both gap kinds matter: the trailing gap (deleted key, no
    * successor — without its tombstone the replay RESURRECTS the key)
    * and the INTERIOR gap (deleted then re-opened — without its
    * tombstone the replay glues the pre-delete version's close to the
    * re-open ts, and a same-status re-open gets wrongly suppressed as
    * a duplicate; caught by the stream fixture's driver hash, r13).
    * Synthetic tombstones carry event_id = -1 — below any real event
    * id, so a real event at exactly the deletion ts re-opens AFTER the
    * delete, deterministically. Envelope: a delete and a re-open at
    * the SAME microsecond leave a zero-width gap the version table
    * cannot represent — indistinguishable from no deletion; a source
    * emitting those must rebuild from raw history (the late-slice
    * rebuild path). Late-slice guard inherits from [[scd2Apply]] for
    * keys with an open version; deleted keys have none, so any
    * post-deletion event is a fresh opener by construction. */
  def scd2ApplyCdc(dim: DataFrame, newChanges: DataFrame,
                   opCol: String = "op",
                   checkLate: Boolean = true): DataFrame = {
    val mapped = mapCdcOps(newChanges, opCol)
    val affected = mapped.select(col("user_id")).distinct()
    if (checkLate) assertNotLate(dim, mapped)
    val untouched = dim.join(affected, Seq("user_id"), "left_anti")
    val touched = dim.join(affected, Seq("user_id"), "left_semi")
    val touchedAsChanges = touched
      .select(col("user_id"), col("event_id"), col("status"),
        col("valid_from_us").as("ts_us"))
    val byKeyAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("event_id"))
    // A tombstone is reconstructed at v.valid_to when (a) there is a
    // GAP to the next version (or no next version) — a delete with a
    // later (or no) re-open; or (b) the next version TILES but carries
    // the SAME status — the signature of a zero-width delete+re-open
    // at one microsecond (the normal build suppresses same-status
    // consecutive changes, so two tiling same-status versions can only
    // have had a sentinel between them; r13 review closed this as a
    // silent-divergence corner — the synthetic tombstone at the shared
    // boundary, ordering below the re-open via event_id = -1, replays
    // it exactly).
    val tombstones = touched
      .withColumn("__next_from", lead(col("valid_from_us"), 1).over(byKeyAsc))
      .withColumn("__next_status", lead(col("status"), 1).over(byKeyAsc))
      .where(col("valid_to_us").isNotNull &&
        (col("__next_from").isNull ||
          col("__next_from") =!= col("valid_to_us") ||
          col("__next_status") === col("status")))
      .select(col("user_id"), lit(-1L).as("event_id"),
        lit(Deleted).as("status"), col("valid_to_us").as("ts_us"))
    val rebuilt = dropDeleted(scd2FromChanges(
      touchedAsChanges.unionByName(tombstones).unionByName(mapped)))
    untouched.unionByName(rebuilt)
  }

  /** Raw fixture events as the canonical change-stream shape. */
  def changeStream(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("status"), unix_micros(col("ts")).as("ts_us"))

  /** Incremental maintenance: merge an APPEND-ONLY slice of new changes
    * into an existing dim (built with [[scd2FromChanges]], i.e. still
    * carrying `event_id`) WITHOUT the raw history — PROVIDED the
    * envelope below holds, the versions of the touched keys are a
    * sufficient compression of their suppressed change stream:
    * converting them back to change points and rebuilding only those
    * keys reproduces the from-scratch build bit-for-bit (ScdSpec pins
    * the identity; suppressed-duplicate ts are genuinely lost, which
    * is exactly why the envelope is guarded on the absorbed
    * high-water, not on valid_from). Cost is O(affected keys' versions +
    * slice), not O(history): the anti/semi joins key-partition on
    * user_id and the untouched (usually overwhelming) majority of the
    * dim is never rewritten.
    *
    * Envelope — ENFORCED in the engine (r12): the slice must be
    * append-only PER KEY — every new ts at-or-after the key's
    * ABSORBED high-water (`last_seen_us`: the max event ts the open
    * version has seen, INCLUDING suppressed duplicates, which is
    * strictly more than its valid_from). LATE data can resurrect a
    * suppressed duplicate that compression dropped (… A(t1)
    * [A(t5) suppressed] … + late B(t3) ⇒ A(t5) becomes a change
    * again) — that case needs the raw-history rebuild path, which
    * [[scd2]] is. Guarding on valid_from alone (the first r12 cut)
    * missed exactly that case: an event between the open version's
    * start and a later suppressed ts passed the check and diverged
    * silently; the high-water closes it. Residual: a tie AT the
    * high-water (new event with ts equal to the last absorbed one)
    * is accepted and ordered by event_id, the same total order the
    * from-scratch build uses — identical-ts reorders across slices
    * are inherent to any ts-keyed incremental apply. Probe cost,
    * honestly: one aggregate of the SLICE joined to the dim's open
    * rows and a driver-side take(3) — a second dim scan per apply,
    * the price of failing BEFORE any bytes are staged (an in-plan
    * assert would fail mid-publish instead). `checkLate = false`
    * opts out when the feed is append-only by construction. */
  def scd2Apply(dim: DataFrame, newChanges: DataFrame,
                checkLate: Boolean = true): DataFrame = {
    val affected = newChanges.select(col("user_id")).distinct()
    if (checkLate) assertNotLate(dim, newChanges)
    val untouched = dim.join(affected, Seq("user_id"), "left_anti")
    val touchedAsChanges = dim.join(affected, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("event_id"), col("status"),
        col("valid_from_us").as("ts_us"))
    val rebuilt = scd2FromChanges(
      touchedAsChanges.unionByName(
        newChanges.select(col("user_id"), col("event_id"), col("status"),
          col("ts_us"))))
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time lookup against the SCD2 dim: the status of every key
    * as of `atUs` — a banded validity probe (`valid_from ≤ t < valid_to`
    * with the open version's NULL upper bound), the query pattern the
    * windows exist to serve. */
  def statusAsOf(dim: DataFrame, atUs: Long): DataFrame =
    dim.where(col("valid_from_us") <= atUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > atUs))
      .select(col("user_id"), col("status"), col("version_no"))

  /** The canonical SCD2 consumer: each fact row joined to the dimension
    * version valid AT ITS OWN timestamp. Plan shape for scale: an
    * EQUI-join on the dimension key does the heavy lifting (hash join,
    * key-partitioned — never a pure range/theta join over the fact) and
    * the validity band is the residual filter; per key the dim carries
    * only its handful of versions, so the fanout before filtering is
    * bounded by versions-per-key, not fact size.
    *
    * The output is per-key audit aggregates, two of them
    * self-certifying: the half-open windows TILE each timeline, so
    * every fact row matches exactly one version (`n_joined` ≡ the key's
    * fact count) and a fact's event always lands in the version its own
    * change opened (`n_status_mismatch` ≡ 0). The DuckDB twin
    * recomputes both from scratch. */
  def factAsOfDim(spark: SparkSession, dir: String): DataFrame = {
    val ev = changeStream(spark, dir)
      .select(col("user_id").as("f_user_id"), col("status").as("f_status"),
        col("ts_us").as("f_ts_us"))
    val dim = scd2(spark, dir)
    ev.join(dim, col("f_user_id") === col("user_id") &&
        col("valid_from_us") <= col("f_ts_us") &&
        (col("valid_to_us").isNull || col("valid_to_us") > col("f_ts_us")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_joined"),
        countDistinct(col("version_no")).as("n_versions_hit"),
        max(col("version_no")).as("max_version"),
        sum(when(col("f_status") =!= col("status"), 1L).otherwise(0L))
          .as("n_status_mismatch"))
  }
}
