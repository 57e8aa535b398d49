package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Driver-side REPLAYS of the serving-tier compositions on the real
  * fixture — an exactness oracle independent of both the DuckDB twins
  * and Spark itself: plain-Scala loops recompute MMR and bitext mining
  * from the raw parquet values with the identical IEEE operation
  * order, and the distributed results must match bit-for-bit. */
class ServeReplaySpec extends SparkSpec {

  private case class Vec(id: Long, v: Array[Double], n: Double)

  /** LTR dot — the dot_d / list_sum operation order. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def corpusOf(dir: String): Seq[Vec] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        Vec(r.getLong(0), v, math.sqrt(dot(v, v)))
      }.toSeq.sortBy(_.id)

  test("mmrDiversify == plain-Scala greedy replay on the fixture") {
    val c = corpusOf(sf0001)
    val byId = c.map(v => v.id -> v).toMap
    val want = c.filter(_.id < Similarity.NumQueries).flatMap { q =>
      val pool = c.filter(_.id != q.id)
        .map(x => (x.id, dot(q.v, x.v) / (q.n * x.n)))
        .sortBy { case (id, rel) => (-rel, id) }
        .take(Similarity.MmrPool)
      var cand = pool.map { case (id, rel) => (id, rel, 0.0) }
      (1 to Similarity.MmrKeep).map { t =>
        val (selId, _, _) = cand
          .map { case (id, rel, pen) => (id, rel, pen) }
          .minBy { case (id, rel, pen) => (-(0.7 * rel - 0.3 * pen), id) }
        val sel = cand.find(_._1 == selId).get
        val score = 0.7 * sel._2 - 0.3 * sel._3
        val sv = byId(selId)
        cand = cand.filter(_._1 != selId).map { case (id, rel, pen) =>
          val x = byId(id)
          (id, rel, math.max(pen, dot(x.v, sv.v) / (x.n * sv.n)))
        }
        (q.id, selId, t, score)
      }
    }.toSet
    val got = Similarity.mmrDiversify(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got == want, s"MMR replay diverged:\n got=$got\nwant=$want")
  }

  test("hardNegatives == plain-Scala cross-group replay on the fixture") {
    val c = corpusOf(sf0001)
    val label = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val want = c.filter(_.id < Similarity.NumQueries).flatMap { q =>
      c.filter(x => label(x.id) != label(q.id))
        .map(x => (x.id, dot(q.v, x.v) / (q.n * x.n)))
        .sortBy { case (id, cs) => (-cs, id) }
        .take(Similarity.TopK)
        .zipWithIndex
        .map { case ((id, cs), i) => (q.id, id, label(id), cs, i + 1) }
    }.toSet
    val got = Similarity.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue, r.getDouble(3), r.getInt(4)))
      .toSet
    assert(got == want, s"hard-negative replay diverged:\n got=$got")
  }

  test("bitextMine == plain-Scala margin replay on the fixture") {
    val c = corpusOf(sf0001)
    val lang = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val as = c.filter(v => lang(v.id) == "en")
    val bs = c.filter(v => lang(v.id) == "de")
    assert(as.nonEmpty && bs.nonEmpty)
    def cos(a: Vec, b: Vec) = dot(a.v, b.v) / (a.n * b.n)
    // Micro-round HALF_UP away from zero — Spark/DuckDB round(), NOT
    // Math.round (which floors ties for negatives).
    def micro(x: Double): Long =
      BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    val fa = as.map { a =>
      a.id -> bs.map(b => (b.id, cos(a, b)))
        .sortBy { case (id, cs) => (-cs, id) }.take(Similarity.MineK)
    }.toMap
    val fb = bs.map { b =>
      b.id -> as.map(a => (a.id, cos(a, b)))
        .sortBy { case (id, cs) => (-cs, id) }.take(Similarity.MineK)
    }.toMap
    val ka = fa.map { case (id, nn) =>
      id -> ((nn.map(p => micro(p._2)).sum, nn.length.toLong))
    }
    val kb = fb.map { case (id, nn) =>
      id -> ((nn.map(p => micro(p._2)).sum, nn.length.toLong))
    }
    val want = as.flatMap { a =>
      val cands = fa(a.id).map { case (bId, cs) =>
        val (sa, ca) = ka(a.id)
        val (sb, cb) = kb(bId)
        val margin = cs /
          (((sa.toDouble / ca / 1000000.0) + (sb.toDouble / cb / 1000000.0))
            / 2.0)
        (bId, cs, margin)
      }
      val best = cands.minBy { case (id, _, m) => (-m, id) }
      if (best._3 > 1.05) Some((a.id, best._1, best._2, best._3)) else None
    }.toSet
    val got = Similarity.bitextMine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == want, s"bitext replay diverged:\n got=$got\nwant=$want")
  }
}
