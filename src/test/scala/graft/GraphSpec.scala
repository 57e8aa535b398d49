package graft

import graft.operators.Graph

/** Source-authority PageRank (operators/Graph.scala): structural
  * ordering on a crafted graph, mass conservation under the
  * fixed-point floor losses, self-loop exclusion, and the
  * repartition-determinism the all-integer recurrence guarantees. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Hub-and-spokes plus isolates: a touches b (weight 3) and c
  // (weight 1); d carries only a self-loop (NOT syndication — must be
  // dropped); e has nothing at all.
  private def nodes =
    Seq("a", "b", "c", "d", "e").toDF("source")
  private def overlap =
    Seq(("a", "b", 3L), ("a", "c", 1L), ("d", "d", 5L))
      .toDF("source_a", "source_b", "n_dup_pairs")

  private def ranksOf(
      ns: org.apache.spark.sql.DataFrame,
      ov: org.apache.spark.sql.DataFrame): Map[String, Long] =
    Graph.authorityFrom(ns, ov).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("authority orders hub > heavy spoke > light spoke > isolated") {
    val r = ranksOf(nodes, overlap)
    assert(r.keySet == Set("a", "b", "c", "d", "e"))
    // a receives ALL of b's and c's damped mass; b gets 3/4 of a's,
    // c gets 1/4; the isolates only ever hold teleport + dangling
    // redistribution.
    assert(r("a") > r("b"), s"hub must outrank spokes: $r")
    assert(r("b") > r("c"), s"edge weight must order the spokes: $r")
    assert(r("c") > r("d"), s"connected must outrank isolated: $r")
  }

  test("self-loops are excluded and isolates hold identical rank") {
    val r = ranksOf(nodes, overlap)
    // d's self-loop must not manufacture authority: d is exactly as
    // ranked as the edge-free e.
    assert(r("d") == r("e"), s"self-loop leaked authority: $r")
  }

  test("rank mass is conserved to within the documented floor loss") {
    val r = ranksOf(nodes, overlap)
    val total = r.values.sum
    assert(total <= Graph.Scale, s"mass created from nothing: $total")
    assert(total >= Graph.Scale / 100L * 99L,
      s"floor losses exceeded 1%: $total of ${Graph.Scale}")
  }

  test("all-integer recurrence is invariant under repartitioning") {
    val base = ranksOf(nodes, overlap)
    val shuffled = ranksOf(nodes.repartition(7), overlap.repartition(5))
    assert(base == shuffled,
      "rank drifted with partitioning — a float leaked into the recurrence")
  }

  test("every rank is positive (teleport floors the minimum)") {
    assert(ranksOf(nodes, overlap).values.forall(_ > 0L))
  }

  test("closed-form dangling mass equals the per-iteration distributed " +
      "probe (r17 job-count optimization)") {
    // Reference: the r10–r16 recurrence with the dangling mass SUMMED
    // from the ranks frame each round — replicated here verbatim so the
    // shipped closed form (dangling nodes are isolated, hence all carry
    // the identical scalar rank) is pinned against the probed original.
    import org.apache.spark.sql.functions._
    val ov = overlap.where(col("source_a") =!= col("source_b"))
    val edges = ov.select(col("source_a").as("src"),
        col("source_b").as("dst"), col("n_dup_pairs").as("w"))
      .unionAll(ov.select(col("source_b").as("src"),
        col("source_a").as("dst"), col("n_dup_pairs").as("w")))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val shares = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        expr(s"(w * ${Graph.ShareScale}) DIV ow").as("share"))
    val srcs = shares.select(col("src")).distinct()
    val ns = nodes.select(col("source")).distinct()
      .join(srcs, col("source") === col("src"), "left")
      .select(col("source"), col("src").isNull.as("dangling"))
      .localCheckpoint()
    val n = ns.count()
    val teleport =
      (Graph.Scale * (Graph.DampDen - Graph.DampNum) / Graph.DampDen) / n
    var ranks = ns.withColumn("r", lit(Graph.Scale / n)).localCheckpoint()
    for (_ <- 1 to Graph.Iterations) {
      val dang = ranks.where(col("dangling"))
        .agg(coalesce(sum(expr(
          s"(r * ${Graph.DampNum}) DIV ${Graph.DampDen}")), lit(0L)))
        .head().getLong(0)
      val inMass = shares
        .join(ranks.select(col("source").as("src"), col("r")), "src")
        .select(col("dst"),
          expr(s"(((r * ${Graph.DampNum}) DIV ${Graph.DampDen}) * share) " +
            s"DIV ${Graph.ShareScale}").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = ns.join(inMass, ns("source") === inMass("dst"), "left")
        .select(col("source"), col("dangling"),
          (lit(teleport) + coalesce(col("m"), lit(0L)) + lit(dang / n))
            .as("r"))
        .localCheckpoint()
    }
    val expect = ranks.select(col("source"), col("r")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranksOf(nodes, overlap) ==
      expect.map { case (k, v) => k -> v })
  }
}
