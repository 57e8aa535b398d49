package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Graph, Retrieval}

/** ScalaCheck exactness properties for the round-10 operators, checked
  * against driver-side reference implementations — an oracle
  * INDEPENDENT of the DuckDB twins: the distributed formulation must
  * reproduce the plain-Scala recurrence bit-for-bit on random inputs
  * (including all-dangling graphs, multi-edges folded away by
  * canonicalization, empty phrase hits, and overlap-heavy strings). */
class GraphPhrasePropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- PageRank vs a plain-Scala replay of the integer recurrence ----

  private def referenceAuthority(nodes: Seq[String],
      overlap: Seq[(String, String, Long)]): Map[String, Long] = {
    val ns = nodes.distinct
    val edges = overlap.filter(p => p._1 != p._2)
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val share = edges.map { case (s, d, w) =>
      (s, d) -> (w * Graph.ShareScale) / outw(s)
    }.toMap
    val n = ns.size.toLong
    val dangling = ns.filterNot(outw.contains)
    val teleport = (Graph.Scale * (Graph.DampDen - Graph.DampNum) /
      Graph.DampDen) / n
    var r = ns.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to Graph.Iterations) {
      val dang = dangling.map(d => r(d) * Graph.DampNum / Graph.DampDen).sum
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, d, _) =>
          (r(s) * Graph.DampNum / Graph.DampDen) * share((s, d)) /
            Graph.ShareScale
        }.sum
      }
      r = ns.map(x => x -> (teleport + in.getOrElse(x, 0L) + dang / n)).toMap
    }
    r
  }

  private val nodePool = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private def graphSample(seed: Long): (Seq[String], Seq[(String, String, Long)]) = {
    val edgeGen = for {
      i <- Gen.chooseNum(0, nodePool.size - 1)
      j <- Gen.chooseNum(0, nodePool.size - 1)
      w <- Gen.chooseNum(1L, 5L)
    } yield (nodePool(math.min(i, j)), nodePool(math.max(i, j)), w)
    val nEdges = (seed % 7).toInt // includes 0: the all-dangling graph
    val raw = Gen.listOfN(nEdges, edgeGen)
      .pureApply(Gen.Parameters.default, Seed(seed))
    // Canonical unique pairs (the sourceOverlapFrom contract): fold
    // multi-edges by summing weights, keep self-pairs so the operator's
    // exclusion is exercised.
    val folded = raw.groupBy(p => (p._1, p._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).sum) }.toSeq
    (nodePool, folded)
  }

  test("authorityFrom == plain-Scala integer recurrence (12 random graphs)") {
    (1L to 12L).foreach { seed =>
      val (nodes, overlap) = graphSample(seed)
      val got = Graph.authorityFrom(
        nodes.toDF("source"),
        overlap.toDF("source_a", "source_b", "n_dup_pairs"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = referenceAuthority(nodes, overlap)
      assert(got == want, s"seed $seed: $got vs $want (overlap $overlap)")
    }
  }

  // ---- Phrase search vs a sliding-window scan ----

  private def referencePhrase(docs: Seq[(Long, String)],
      phrase: Seq[String]): Map[Long, (Long, Int)] =
    docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val starts = toks.indices.filter { i =>
        i + phrase.length <= toks.length &&
          phrase.indices.forall(j => toks(i + j) == phrase(j))
      }
      if (starts.isEmpty) None
      else Some(id -> ((starts.size.toLong, starts.min)))
    }.toMap

  test("phraseSearchOf == sliding-window scan (12 random corpora)") {
    val alpha = Vector("a", "b", "c")
    (1L to 12L).foreach { seed =>
      val docGen = for {
        len <- Gen.chooseNum(0, 30)
        toks <- Gen.listOfN(len, Gen.oneOf(alpha))
      } yield toks.mkString(" ")
      val docs = Gen.listOfN(6, docGen)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val phrase = Gen.listOfN((seed % 3).toInt + 1, Gen.oneOf(alpha))
        .pureApply(Gen.Parameters.default, Seed(seed + 1000))
      val got = Retrieval.phraseSearchOf(docs.toDF("doc_id", "text"), phrase)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
        .toMap
      val want = referencePhrase(docs, phrase)
      assert(got == want, s"seed $seed phrase $phrase: $got vs $want")
    }
  }
}
