package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** One-off profiling main for the PLANS.md long-document BPE row
  * (VERDICT r9 #5): mints a corpus of BOOK-LENGTH documents (args(0)
  * docs × args(1) pieces each, default 64 × 200k — ~a short novel of
  * pre-tokenizer pieces per doc), then times whole-document
  * [[TextOps.bpeEncode]] against chunk-first
  * [[TextOps.bpeEncodeChunked]] on the identical corpus and asserts
  * the outputs match. The fixture corpus can't show this difference —
  * its docs are ~200 pieces, far below one segment — so the long-doc
  * regime is observed here, not inferred. */
object ProfBpeLongDoc {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(64)
    val pieces = args.lift(1).map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // Zipf-ish token pool so merge mining finds real structure:
    // md5-derived deterministic words, rank-skewed by modular bias.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_longdoc_").toString
    spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(pieces - 1)),
            i => concat(lit("w"),
              pmod(conv(substring(md5(concat(col("id"), lit(":"), i)), 1, 4),
                16, 10).cast("long"), pmod(i, lit(37)) * 3 + 5))))
          .as("text"),
        lit("en").as("lang"), lit("synth").as("source"),
        lit(0L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // Warmup both paths once (merge mining dominates cold time).
    TextOps.bpeEncode(spark, dir).write.mode("overwrite").format("noop").save()
    TextOps.bpeEncodeChunked(spark, dir)
      .write.mode("overwrite").format("noop").save()
    time(s"bpe_encode whole-doc ($nDocs x $pieces pieces)") {
      TextOps.bpeEncode(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    time(s"bpe_encode chunk-first (segments=${TextOps.BpeChunkPieces})") {
      TextOps.bpeEncodeChunked(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    val a = TextOps.bpeEncode(spark, dir)
    val b = TextOps.bpeEncodeChunked(spark, dir)
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "chunk-first diverged from whole-doc on the long-doc corpus")
    println("outputs identical")
    spark.stop()
  }
}
