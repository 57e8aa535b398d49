package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.multimodal.Multimodal
import graft.sources.Generator

/** Salted skew join equivalence + multimodal payload plumbing. */
class SkewMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on a hot-keyed workload") {
    // hotCountry=true: every left row carries the 'Peru' hot key.
    val fact = Generator.transactions(spark, 2000)
      .withColumn("country", lit("Peru"))
    val dim = Seq(("Peru", "LATAM"), ("Germany", "EMEA")).toDF("country", "region")
    val plain = fact.join(dim, Seq("country"))
    val salted = Skew.saltedJoin(fact, dim, Seq("country"),
      spreadBy = col("transaction_id"), buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salted shuffle key actually spreads the hot key
    val spread = fact.withColumn("s",
      pmod(xxhash64(col("transaction_id")), lit(8)))
      .groupBy($"s").count().count()
    assert(spread == 8)
  }

  test("multimodal payloads: bytes round-trip and metadata is typed") {
    val p = Multimodal.withPayload(spark, sf0001)
    val row = p.orderBy($"doc_id").head()
    val meta = row.getStruct(2)
    assert(Seq("image/png", "audio/wav", "video/mp4")
      .contains(meta.getAs[String]("mime")))
    assert(meta.getAs[Int]("width") >= 64 && meta.getAs[Int]("n_frames") >= 1)
    // payload is the UTF-8 text bytes
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy($"doc_id").head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8")
      == docs.getAs[String]("text"))
  }

  test("featureExtractStub: deterministic fixed-dim features per doc") {
    val feats = Multimodal.featureExtractStub(
      Multimodal.withPayload(spark, sf0001), dim = 8)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(feats.count() == n)
    val a = feats.orderBy(col("doc_id")).head()
    val b = Multimodal.featureExtractStub(
      Multimodal.withPayload(spark, sf0001), dim = 8)
      .orderBy(col("doc_id")).head()
    assert(a.getSeq[Float](1).toList == b.getSeq[Float](1).toList)
    assert(a.getSeq[Float](1).length == 8)
  }

  test("resizeStub: dims fit the box, aspect preserved, payload untouched") {
    val p = Multimodal.withPayload(spark, sf0001)
    val r = Multimodal.resizeStub(p, maxSide = 256)
    val row = r.join(p.select($"doc_id", $"payload".as("orig"),
        $"meta".as("m0")), "doc_id")
      .select($"meta.width", $"meta.height", $"m0.width", $"m0.height",
        ($"payload" === $"orig").as("same"))
    row.collect().foreach { x =>
      val (w, h, w0, h0) = (x.getInt(0), x.getInt(1), x.getInt(2), x.getInt(3))
      assert(w <= 256 && h <= 256 && w >= 1 && h >= 1)
      // no upscaling
      assert(w <= w0 && h <= h0)
      assert(x.getBoolean(4))
    }
  }

  test("frame sampling: stride covers [0, n) with at most ~8 samples") {
    val df = Seq(1, 7, 8, 9, 240).toDF("n")
      .select($"n", Multimodal.frameSampleIndices($"n").as("idx"))
    df.collect().foreach { r =>
      val n = r.getInt(0)
      val idx = r.getSeq[Int](1)
      assert(idx.head == 0 && idx.last < n && idx.length <= 9)
    }
  }
}
