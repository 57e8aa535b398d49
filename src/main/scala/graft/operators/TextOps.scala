package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for the LLM-data-pipeline tier (north star in
  * SURVEY.md intro / BASELINE.json): tokenization, token/char statistics,
  * heuristic language ID, quality scoring, and document fingerprinting —
  * all over the `documents` fixture table.
  *
  * Everything is built from codegen'd built-in functions + higher-order
  * array functions (no UDFs), so Catalyst can push projections/filters
  * into the parquet scan and the per-document work stays inside
  * whole-stage codegen. Every double-valued output is produced by an
  * arithmetic expression written token-for-token identically in the
  * DuckDB oracle (same operation order ⇒ bit-identical IEEE results).
  */
object TextOps {

  /** Whitespace-normalized lowercase text: the canonical form for
    * fingerprinting and dedup. */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokenization of the lowercased text ([] for empty docs). */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("\\S+"), lit(0))

  /** BPE-ish sub-word pieces: alpha runs, digit runs, and single
    * non-alphanumeric marks — the classic pre-tokenizer regex shape. */
  def bpePieces(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles of the normalized token stream
    * (the MinHash/Jaccard unit). Empty array when fewer than n tokens
    * (guarded: Spark's sequence(0, negative) would count DOWN). */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(toks, (i + j + 1).cast("int"))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Per-language stopword lists for the heuristic language scorer.
    * Deterministic tie-break: first list in this order wins. */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "en", "que", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "en", "un", "une", "est", "que", "des"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Per-document token aggregates computed via explode + ONE hash
    * aggregate: the text is tokenized exactly once per document (array
    * expressions referenced by several consumers get re-evaluated per
    * consumer after projection collapse — the r2 lesson), and map-side
    * partial aggregation keeps the shuffle at one row per document.
    * Emits one row per doc_id with n_tokens and one stopword-hit count
    * per requested list. Docs with zero tokens get zero counts. */
  private def tokenAggs(docs: DataFrame,
                        hitLists: Seq[(String, Seq[String])]): DataFrame = {
    val aggs =
      count(lit(1)).as("n_tokens") +: hitLists.map { case (name, words) =>
        sum(when(col("tok").isInCollection(words), 1).otherwise(0)).as(name)
      }
    val agg = Spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
    val zeros = (col("n_tokens") +: hitLists.map(h => col(h._1)))
      .map(c => coalesce(c, lit(0L)))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id") +: zeros.zip("n_tokens" +: hitLists.map(_._1))
        .map { case (c, n) => c.as(n) }: _*)
  }

  /** Corpus statistics rolled up by (lang, source): doc/token/char counts
    * and exact-int-ratio averages. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(tokens(col("text"))).as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Per-document token accounting: whitespace tokens, BPE-ish pieces,
    * char length, exact average token length. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(bpePieces(col("text"))).as("n_pieces"),
        length(col("text")).as("n_chars"),
        when(size(t) > 0,
          aggregate(transform(t, x => length(x)), lit(0),
            (acc, x) => acc + x).cast("double") / size(t))
          .as("avg_token_len"))
  }

  /** Heuristic language ID: stopword-hit votes per language, argmax with
    * deterministic tie-break (StopWords order). The fixture corpus is
    * same-vocab synthetic text, so accuracy is not the point — the
    * deterministic scoring pipeline is (it cross-checks bit-exactly
    * against the DuckDB oracle). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(tokenAggs(docs,
        StopWords.map { case (l, ws) => (s"hits_$l", ws) })
        .drop("n_tokens"), "doc_id")
    val g = greatest(StopWords.map { case (l, _) => col(s"hits_$l") }: _*)
    val pred = StopWords.tail.foldLeft(
      when(col(s"hits_${StopWords.head._1}") === g, lit(StopWords.head._1))) {
      case (acc, (l, _)) => acc.when(col(s"hits_$l") === g, lit(l))
    }
    scored
      .withColumn("predicted_lang", pred)
      .withColumn("correct", col("predicted_lang") === col("lang"))
  }

  /** Per-document quality score: length, punctuation ratio, stopword
    * ratio, combined into a [0,1]-ish composite. All ratios are exact
    * int/int double divisions; the composite is a fixed-order double
    * expression mirrored in the oracle. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
          .as("n_punct"))
      .join(tokenAggs(docs, Seq("n_stop" -> StopWords.head._2)), "doc_id")
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("n_punct"), col("n_stop"))
      .withColumn("punct_ratio",
        when(col("n_chars") > 0,
          col("n_punct").cast("double") / col("n_chars")).otherwise(lit(0.0)))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          col("n_stop").cast("double") / col("n_tokens")).otherwise(lit(0.0)))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * lit(0.5)
          + (lit(1.0) - col("punct_ratio")) * lit(0.3)
          + least(lit(1.0), col("stop_ratio") * lit(5.0)) * lit(0.2))
  }

  /** Word bigrams WITH multiplicity (repetition is about repeats, so no
    * array_distinct here; [] under 2 tokens). */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, (i + 1).cast("int")),
          element_at(toks, (i + 2).cast("int")))))
      .otherwise(array().cast("array<string>"))

  /** Repetition metrics (Gopher-style quality signals): per document,
    * the fraction of bigram occurrences that are repeats of an earlier
    * bigram, and the share of the single most frequent bigram. Shape:
    * explode bigrams → ONE hash aggregate per (doc, bigram) → ONE per
    * doc — map-side partial combine collapses each document before
    * either shuffle; no per-row array folds (the r2 CollapseProject
    * lesson). Zero-bigram docs surface with zero counts via the
    * left join back to the corpus. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perGram = Spread(docs)
      .select(col("doc_id"), explode(bigrams(tokens(col("text")))).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("n")).as("top_bigram_n"))
    docs.select(col("doc_id"))
      .join(perGram, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0,
          (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
            col("n_bigrams")).otherwise(lit(0.0)))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0,
          col("top_bigram_n").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0)))
  }

  /** Document fingerprints: md5 of the normalized text (exact-dup key)
    * plus min/max shingle hashes (a winnowing-style rolling-hash sketch)
    * and the distinct-shingle count. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(tokens(col("text")))
    val hashes = transform(sh, s => md5(s))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(normText(col("text"))).as("fingerprint"),
        when(size(sh) > 0, array_min(hashes)).as("shingle_min"),
        when(size(sh) > 0, array_max(hashes)).as("shingle_max"),
        size(sh).as("n_shingles"))
  }
}
