package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over the corpus syndication graph — the
  * domain-authority signal an LLM-data pipeline feeds into source
  * weighting (CommonCrawl-style curation ranks domains by how content
  * propagates between them; heavily-syndicated canonical sources get
  * upweighted, scrapers and isolated spam pools do not).
  *
  * Nodes are the corpus `source` values; edges are CROSS-source
  * verified near-duplicate pairs from the standing pair table
  * ([[Dedup.sourceOverlapFrom]] — content observed on both ends),
  * symmetrized, weighted by pair count. [[sourceAuthority]] runs a
  * fixed-iteration damped PageRank over that graph.
  *
  * Scale shape: the rank vector stays DISTRIBUTED (one row per source
  * — web-scale corpora have 10⁷⁺ domains, never driver-side), and each
  * iteration is one key-shuffled join (edge src → rank) plus one
  * aggregation (sum by dst) — the textbook Pregel/power-iteration
  * round. Two standing-iterative disciplines:
  *  - the per-edge transition SHARE (this row's fraction of its
  *    source's out-weight) is computed ONCE and reused by every
  *    iteration, so the join side of an iteration is a pure
  *    multiply-sum over a static frame;
  *  - ranks are localCheckpoint-pinned per iteration — lineage
  *    truncation, without which the plan doubles per round (the
  *    standard practice for iterative graph algorithms on Spark).
  * The dangling mass is a one-row aggregate re-entering as a literal
  * (the [[Learn]] scalar-probe class — bounded, never data-sized).
  *
  * Engine-exact determinism: the whole iteration is INTEGER
  * arithmetic. Ranks live in 1e-12 fixed-point units ([[Scale]]),
  * shares in 1e-6 units ([[ShareScale]]), and every division is
  * integer floor division (Spark `DIV` / DuckDB `//` — identical on
  * the non-negative operands used here). No float ever enters the
  * recurrence, so partial-aggregation order cannot perturb the result
  * and the DuckDB twin unrolls the same iterations as CTEs onto
  * bit-identical ranks. Floor losses (≤ 1 unit per division) leak a
  * vanishing fraction of rank mass per round rather than perturbing
  * order — conservation to within 1% is spec-pinned.
  *
  * Overflow bounds (documented, guarded): rank mass totals [[Scale]]
  * = 1e12, so per-node rank ≤ 1e12; the largest product is
  * damped-rank × share ≤ 0.85e12 × 1e6 = 8.5e17 < 2⁶³. The bound is
  * independent of corpus size — growing N only SPREADS the fixed
  * total mass. */
object Graph {

  /** Power-iteration rounds. Six reaches stationarity well inside the
    * fixed-point resolution on corpus-shaped graphs (damping 0.85
    * contracts by ~0.44 per round); the knob a real deployment raises
    * until successive rounds agree. */
  val Iterations = 6

  /** Rank fixed-point scale: total rank mass = 1e12 micro-units. */
  val Scale = 1000000000000L

  /** Per-edge transition-share fixed-point scale (1e-6 resolution). */
  val ShareScale = 1000000L

  /** Damping factor 85/100 kept as exact integers — never a float. */
  val DampNum = 85L
  val DampDen = 100L

  /** PageRank over an explicit node frame (`source`) and an overlap
    * frame (source_a, source_b, n_dup_pairs). Self-loops are excluded
    * (same-source duplication is redundancy, not syndication) and the
    * canonical least/greatest pairs are symmetrized into a directed
    * edge list. Returns (source, rank_micro, authority). */
  def authorityFrom(nodesIn: DataFrame, overlap: DataFrame): DataFrame = {
    val ov = overlap.where(col("source_a") =!= col("source_b"))
    val edges = ov.select(col("source_a").as("src"), col("source_b").as("dst"),
        col("n_dup_pairs").as("w"))
      .unionAll(ov.select(col("source_b").as("src"),
        col("source_a").as("dst"), col("n_dup_pairs").as("w")))
    // Row-stochastic transition matrix in 1e-6 fixed point, computed
    // ONCE: per-edge share of the source's total out-weight. At scale
    // this is the one join+agg the whole run pays for edge preparation.
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val shares = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        expr(s"(w * $ShareScale) DIV ow").as("share"))
      .localCheckpoint()
    // Node frame with a static dangling flag: the symmetrized graph
    // has in-degree > 0 iff out-degree > 0, so dangling == isolated.
    val srcs = shares.select(col("src")).distinct()
    val nodes = nodesIn.select(col("source")).distinct()
      .join(srcs, col("source") === col("src"), "left")
      .select(col("source"), col("src").isNull.as("dangling"))
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "sourceAuthority: empty node set")
    // Teleport term (1-d)·mass/N — exact integer derivation, mirrored
    // token-for-token by the twin: ((Scale·15) div 100) div N.
    val teleport = (Scale * (DampDen - DampNum) / DampDen) / n
    var ranks = nodes.withColumn("r", lit(Scale / n)).localCheckpoint()
    for (_ <- 1 to Iterations) {
      // Dangling (isolated-node) mass: one bounded scalar probe per
      // round, redistributed uniformly — re-enters as a literal.
      val dang = ranks.where(col("dangling"))
        .agg(coalesce(sum(expr(s"(r * $DampNum) DIV $DampDen")), lit(0L)))
        .head().getLong(0)
      val inMass = shares
        .join(ranks.select(col("source").as("src"), col("r")), "src")
        .select(col("dst"),
          expr(s"(((r * $DampNum) DIV $DampDen) * share) DIV $ShareScale")
            .as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = nodes.join(inMass, nodes("source") === inMass("dst"), "left")
        .select(col("source"), col("dangling"),
          (lit(teleport) + coalesce(col("m"), lit(0L)) + lit(dang / n))
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("source"), col("r").as("rank_micro"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("authority"))
  }

  /** Corpus entry point: nodes = every distinct `source` in the corpus
    * (isolated sources still hold teleport mass — an unsyndicated
    * domain has LOW authority, not undefined authority), edges = the
    * verified cross-source near-dup counts served from the standing
    * pair table. */
  def sourceAuthority(spark: SparkSession, dir: String,
                      pairFrame: DataFrame): DataFrame =
    authorityFrom(graft.Tables.documents(spark, dir).select(col("source")),
      Dedup.sourceOverlapFrom(spark, dir, pairFrame))
}
