package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, ScaleEnvelope, Similarity}

/** The three scale-envelope switches (VERDICT r9 #1) as CODE: each
  * derivation is pinned at its exact trip point, and the dispatched
  * forms are proven result-identical across the switch — a form flip
  * at 10⁸ docs must change cost, never output. */
class ScaleEnvelopeSpec extends SparkSpec {

  test("simhash form switch: quarter at the trigger, wide one past it") {
    assert(!ScaleEnvelope.simhashUseWide(ScaleEnvelope.SimhashWideTrigger))
    assert(ScaleEnvelope.simhashUseWide(ScaleEnvelope.SimhashWideTrigger + 1))
    // The trigger is the documented "~10⁸ docs" knee, derived exactly:
    // max quarter occupancy × 2¹⁶ band domain.
    assert(ScaleEnvelope.SimhashWideTrigger == (1L << 26))
  }

  test("simhash auto dispatch: identical pair set on both sides of the switch") {
    val sig = Dedup.simhash64(spark, sf0001).cache()
    try {
      val below = Dedup
        .simhash64NeighborsAutoOf(sig, ScaleEnvelope.SimhashWideTrigger)._1
      val above = Dedup
        .simhash64NeighborsAutoOf(sig, ScaleEnvelope.SimhashWideTrigger + 1)._1
      assert(below.count() > 0, "vacuous: no near-dup pairs at fixture scale")
      assert(below.except(above).isEmpty && above.except(below).isEmpty,
        "the banding forms disagree across the switch point")
      // And the dispatch genuinely changed form: the wide index
      // explodes C(6,3)=20 band rows per doc, the quarter form 4 — an
      // optimized-plan literal count tells them apart without
      // re-deriving results.
      def bandFanout(df: org.apache.spark.sql.DataFrame): Int = {
        val plan = df.queryExecution.optimizedPlan.toString
        "band_idx".r.findAllIn(plan).size
      }
      assert(bandFanout(above) != bandFanout(below) ||
        above.queryExecution.optimizedPlan.toString !=
          below.queryExecution.optimizedPlan.toString,
        "dispatch did not switch the physical construction")
    } finally sig.unpersist()
  }

  test("image near-dup auto dispatch: identical pair set on both sides " +
      "of the switch (r15 — the dHash tier inherits the text envelope)") {
    val payloads = multimodal.Multimodal.imageCorpus(spark, sf0001)
      .localCheckpoint()
    val sig = multimodal.Multimodal.imageSignatures(payloads)
      .drop("dhash").localCheckpoint()
    val below = Dedup
      .simhash64NeighborsAutoOf(sig, ScaleEnvelope.SimhashWideTrigger)._1
    val above = Dedup
      .simhash64NeighborsAutoOf(sig, ScaleEnvelope.SimhashWideTrigger + 1)._1
    assert(below.count() > 0, "vacuous: no image near-dup pairs")
    assert(below.except(above).isEmpty && above.except(below).isEmpty,
      "the image banding forms disagree across the switch point")
    // And the public auto form resolves to the quarter plan at fixture
    // scale (pair-set equality with the pinned imageNearDup).
    val auto = multimodal.Multimodal.imageNearDupAuto(payloads)
    val pinned = multimodal.Multimodal.imageNearDup(payloads)
    assert(auto.except(pinned).isEmpty && pinned.except(auto).isEmpty,
      "imageNearDupAuto drifted from the quarter-banded form")
  }

  test("LSH width: signature bits 0..23 are stable when h widens past 24") {
    // A corpus crossing the old cap must not re-bucket the bits it
    // already had: tableSig draws planes through planeIndexFor, whose
    // base layout (j < 24) is the historical t·24+j. So a WIDER
    // signature's low 24 bits equal the 24-bit signature exactly.
    val c = Similarity.normalizedCorpus(spark, sf0001)
    val s24 = Similarity.bandedSignatureRows(c, 24)
      .select(col("vec_id"), col("tbl"), col("sig").as("sig24"))
    val s30 = Similarity.bandedSignatureRows(c, 30)
      .select(col("vec_id"), col("tbl"), col("sig").as("sig30"))
    val joined = s24.join(s30, Seq("vec_id", "tbl")).cache()
    try {
      assert(joined.count() > 0)
      assert(joined
        .where(col("sig30").bitwiseAND(lit((1L << 24) - 1)) =!= col("sig24"))
        .isEmpty,
        "widening the signature rewrote the base-24 bits")
      // and the extension bits are real: some signature uses bit ≥ 24.
      assert(joined.where(col("sig30") >= lit(1L << 24)).count() > 0,
        "no signature ever set an extension bit — planes 24+ dead")
    } finally joined.unpersist()
  }

  test("planeIndexFor: injective over the full (table, width) grid, " +
    "backward-compatible below 24") {
    val S = Similarity
    val all = for {
      t <- 0 until S.NumTables
      j <- 0 until ScaleEnvelope.AbsMaxPlanes
    } yield (t, j)
    val idx = all.map { case (t, j) => S.planeIndexFor(t, j) }
    assert(idx.distinct.size == idx.size, "plane index collision")
    assert(idx.forall(p => p >= 0 && p < S.NumTables * ScaleEnvelope.AbsMaxPlanes))
    // Historical layout preserved: every signature computed before the
    // envelope change used planes t*24+j — those indices must be
    // untouched or every persisted LSH index breaks.
    for (t <- 0 until S.NumTables; j <- 0 until S.MaxTablePlanes)
      assert(S.planeIndexFor(t, j) == t * S.MaxTablePlanes + j)
    // And the hyperplane table actually covers the extension region.
    assert(S.hyperplanes.length == S.NumTables * ScaleEnvelope.AbsMaxPlanes)
  }

  test("minhash band plan: S-curve inflection nearest the target, " +
    "defaults reproduce the oracle constants") {
    import graft.operators.Dedup
    // The repo defaults MUST derive the exact constants every minhash
    // oracle was built against — the policy re-derives, never changes.
    assert(ScaleEnvelope.minhashBandPlan(12, 0.6) == ((3, 4)))
    assert(Dedup.BandRows == 3 && Dedup.NumBands == 4)
    // The knee moves the right way: higher threshold ⇒ more rows per
    // band (stricter collisions), lower ⇒ fewer (higher recall).
    assert(ScaleEnvelope.minhashBandPlan(12, 0.1)._1 == 1)
    assert(ScaleEnvelope.minhashBandPlan(12, 0.95)._1 >= 6)
    val rs = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .map(t => ScaleEnvelope.minhashBandPlan(12, t)._1)
    assert(rs == rs.sorted, s"rows-per-band not monotone in t: $rs")
    // A plan is always a full partition of the hash budget.
    for (h <- Seq(12, 16, 20, 128); t <- Seq(0.2, 0.5, 0.8)) {
      val (r, b) = ScaleEnvelope.minhashBandPlan(h, t)
      assert(r * b == h)
    }
    // And the implied inflection brackets the target reasonably: the
    // chosen plan's threshold is the closest among divisors.
    val (r, b) = ScaleEnvelope.minhashBandPlan(16, 0.5)
    val chosen = math.pow(1.0 / b, 1.0 / r)
    (1 to 16).filter(16 % _ == 0).foreach { rr =>
      val alt = math.pow(1.0 / (16 / rr), 1.0 / rr)
      assert(math.abs(chosen - 0.5) <= math.abs(alt - 0.5) + 1e-12)
    }
  }

  test("centroid count: continuous at the sqrt→cell-cap crossover") {
    val cap = ScaleEnvelope.TargetCellCap
    val xover = ScaleEnvelope.CentroidSqrtCrossover
    def sqrtForm(n: Long) =
      math.max(Similarity.MinCentroids,
        math.ceil(math.sqrt(n.toDouble)).toInt)
    def capForm(n: Long) = ((n + cap - 1) / cap).toInt
    // AT the boundary and one past it the two forms agree — there is
    // no k cliff, hence no result cliff, at the switch point.
    assert(sqrtForm(xover) == capForm(xover))
    assert(sqrtForm(xover + 1) == capForm(xover + 1))
    assert(Similarity.centroidCountFor(xover) == cap.toInt)
    assert(Similarity.centroidCountFor(xover + 1) == cap.toInt + 1)
    // Far past it, the cap form holds cells at c* members: at 10¹⁰
    // vectors the sqrt form would hand each cell 10⁵ members (N^1.5
    // pair work); the envelope keeps it at ~c*.
    val big = 10L * xover
    val k = Similarity.centroidCountFor(big)
    assert(big / k <= cap && k == capForm(big))
    // Monotone across the seam (no sawtooth a scheduler could flap on).
    val around = Seq(xover - 1, xover, xover + 1, xover + cap, 2 * xover)
    val ks = around.map(Similarity.centroidCountFor(_))
    assert(ks == ks.sorted)
  }

  test("centroid count: exact at the Int.MaxValue guard edge (BigInt " +
      "ceil-div neither wraps nor trips early)") {
    val cap = ScaleEnvelope.TargetCellCap
    // Largest admissible corpus: k = ⌈n/c*⌉ = Int.MaxValue exactly at
    // n = Int.MaxValue · c* (≈ 2.1·10¹³ vectors). The r10 Long form
    // `((n + c* − 1) / c*).toInt` would TRUNCATE here — deriving a
    // wrong small k silently; the BigInt form returns the exact value.
    val edge = Int.MaxValue.toLong * cap
    assert(Similarity.centroidCountFor(edge) == Int.MaxValue)
    // Just below: still exact (ceil-div of a non-multiple).
    assert(Similarity.centroidCountFor(edge - 1) == Int.MaxValue)
    assert(Similarity.centroidCountFor(edge - cap) == Int.MaxValue - 1)
    // One vector past the edge: k would be Int.MaxValue + 1 — the
    // guard fires LOUDLY with the remedy, instead of wrapping.
    val e = intercept[IllegalArgumentException] {
      Similarity.centroidCountFor(edge + 1)
    }
    assert(e.getMessage.contains("TargetCellCap") &&
      e.getMessage.contains("shard"))
  }

  test("tpch q11 guard: DIV floor bound is exact — bound passes " +
      "wrap-free, bound+1 provably wraps and trips assert_true") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val M = Long.MaxValue
    val nParts = 3L
    val bound = M / nParts // DIV on non-negatives ≡ this floor
    // The floor property the guard rides: at the bound the cross
    // product stays in range; one past it provably exceeds 2⁶³−1.
    assert(BigInt(bound) * nParts <= BigInt(M))
    assert(BigInt(bound + 1) * nParts > BigInt(M))
    def guardedCount(valueC: Long): Long =
      Seq((valueC, 100L, nParts)).toDF("value_c", "total_c", "n_parts")
        .where(coalesce(
          assert_true(graft.operators.Tpch.q11InRange(mult = 2L),
            lit("boundary")).cast("boolean"), lit(true)))
        .count()
    assert(guardedCount(bound) == 1L, "exact-bound value was rejected")
    val e = intercept[Exception] { guardedCount(bound + 1) }
    assert(e.getMessage != null)
    // And the total_c leg: ⌊M/mult⌋ passes, one past trips.
    def totalGuard(totalC: Long): Long =
      Seq((1L, totalC, nParts)).toDF("value_c", "total_c", "n_parts")
        .where(coalesce(
          assert_true(graft.operators.Tpch.q11InRange(mult = 2L),
            lit("boundary")).cast("boolean"), lit(true)))
        .count()
    assert(totalGuard(M / 2) == 1L)
    intercept[Exception] { totalGuard(M / 2 + 1) }
  }
}
