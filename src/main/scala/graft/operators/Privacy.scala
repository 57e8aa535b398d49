package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection / redaction for the LLM-data-pipeline tier: a
  * training-data corpus must be scrubbed of emails, phone numbers and IP
  * addresses before packing. Pure codegen'd regexp expressions (no UDFs),
  * patterns restricted to the regex subset Java and RE2 interpret
  * identically, so the whole pass is oracle-checkable bit-for-bit.
  *
  * Scale: one projection per document — embarrassingly parallel, stays
  * inside whole-stage codegen, no shuffle at all.
  */
object Privacy {

  /** Patterns deliberately use only character classes, bounded repeats
    * and word boundaries — identical semantics in Java regex (Spark) and
    * RE2 (DuckDB); no backreferences or lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redaction order is part of the contract (emails first, so an
    * address's digits can't be half-eaten by the phone pattern). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        IpRe, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Adds PII counts and the redacted text to any frame. */
  def withPiiRedacted(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(col(textCol), lit(IpRe)))
      .withColumn("redacted", redact(col(textCol)))

  /** 16-digit payment-card shape, 4-4-4-4 groups with optional space or
    * dash separators — same RE2/Java-identical subset as the patterns
    * above. Shape alone is NOT detection: see [[luhnValid]]. */
  val CardRe = "\\b(?:[0-9]{4}[- ]?){3}[0-9]{4}\\b"

  /** Luhn checksum over a digit string, as pure Catalyst HOFs (no UDF):
    * i-th digit from the right is doubled at even i (1-indexed), minus 9
    * when the double exceeds 9; valid iff the sum is ≡ 0 (mod 10).
    * Validation-gating matters at corpus scale: a bare 16-digit regex
    * fires on order numbers, serials and timestamps — only ~1 in 10
    * random digit strings passes Luhn, so the gate cuts false-positive
    * redactions ~10× while never missing a real card number. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val summed = aggregate(
      transform(sequence(lit(1), n), i => {
        val d = substring(digits, (n - i + lit(1)).cast("int"), lit(1))
          .cast("int")
        when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    pmod(summed, lit(10)) === 0
  }

  /** Card detection + PER-MATCH conditional redaction: extract all
    * shape-matches, keep only those whose digits pass [[luhnValid]],
    * and replace exactly the validated matches (a fold over the
    * validated list). regexp_replace with the static pattern could not
    * express this: the predicate is per-match, not per-pattern. Still
    * one shuffle-free codegen'd projection per row.
    *
    * Each fold step replaces the candidate SPAN-ANCHORED (ADVICE r8): the
    * pattern is the matched string re-wrapped in the same `\b` boundaries
    * CardRe matched under, so an occurrence of the digits embedded inside
    * a longer digit run — where the original regex did NOT match — is
    * left untouched (a bare literal `replace` would eat it). Embedding
    * the match literally in a regex is safe because CardRe's alphabet is
    * exactly `[0-9 -]`: no regex metacharacters can occur in a match. */
  def withCardsRedacted(df: DataFrame, textCol: String = "text"): DataFrame = {
    val candidates = regexp_extract_all(col(textCol), lit(CardRe), lit(0))
    val valid = filter(candidates,
      m => luhnValid(regexp_replace(m, "[- ]", "")))
    df.withColumn("n_card_candidates", size(candidates))
      .withColumn("n_cards_valid", size(valid))
      .withColumn("redacted",
        aggregate(valid, col(textCol), (acc, m) =>
          regexp_replace(acc, concat(lit("\\b"), m, lit("\\b")), lit("[CARD]"))))
  }

  /** Demo query over `documents`: the fixture corpus contains no PII, so
    * each doc gets a deterministic synthetic contact line appended
    * (derived from doc_id — the DuckDB oracle constructs the identical
    * string) and the redaction pass must find and scrub exactly that.
    * Emits count columns and the md5 of the redacted text (small, exact). */
  /** Digit-generator primes for the synthetic card corpus: card digit i
    * (left to right, 15 of them) is (doc_id · P_i) mod 10; the 16th is
    * the Luhn check digit — computed honestly for even doc_ids, shifted
    * +5 (always wrong) for odd ones. Shared with the DuckDB oracle so
    * both engines construct the identical corpus and the oracle can
    * predict the validator's verdict independently. */
  val CardPrimes: Seq[Int] =
    Seq(3, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)

  /** Demo query: every doc gets a card number appended whose digits vary
    * with doc_id — Luhn-VALID on even doc_ids, guaranteed-invalid on odd
    * ones. The detector must redact exactly the valid half: per-match
    * gating, not shape matching. */
  def cardRedact(spark: SparkSession, dir: String): DataFrame = {
    val ds: Seq[Column] = CardPrimes.map(p => pmod(col("doc_id") * p, lit(10)))
    // Partial Luhn sum over d1..d15 in the 16-digit layout (check digit
    // at position 16): from the right, d_i sits at r = 17-i, doubled at
    // even r ⇔ odd i (1-indexed) ⇔ even Scala idx.
    val part = ds.zipWithIndex.map { case (d, idx) =>
      if (idx % 2 == 0) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2) else d
    }.reduce(_ + _)
    val cv = pmod(lit(10) - pmod(part, lit(10)), lit(10))
    val check = when(pmod(col("doc_id"), lit(2)) === 0, cv)
      .otherwise(pmod(cv + 5, lit(10)))
    val allDigits = ds :+ check
    def grp(s: Seq[Column]): Column = concat(s.map(_.cast("string")): _*)
    val card = concat_ws(" ",
      grp(allDigits.slice(0, 4)), grp(allDigits.slice(4, 8)),
      grp(allDigits.slice(8, 12)), grp(allDigits.slice(12, 16)))
    val text2 = concat(col("text"), lit(" Pay to card "), card, lit(" today."))
    withCardsRedacted(
      Tables.documents(spark, dir).select(col("doc_id"), text2.as("text")))
      .select(
        col("doc_id"), col("n_card_candidates"), col("n_cards_valid"),
        md5(col("redacted")).as("redacted_md5"),
        length(col("redacted")).as("n_chars_redacted"))
  }

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val contact = concat(
      col("text"),
      lit(" Contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com, call 555-"),
      lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("doc_id") * 13 % 10000).cast("string"), 4, "0"),
      lit(" or ping 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), (col("doc_id") * 3 % 256).cast("string"), lit(" now."))
    withPiiRedacted(
      Tables.documents(spark, dir).select(col("doc_id"), contact.as("text")))
      .select(
        col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("redacted")).as("redacted_md5"),
        length(col("redacted")).as("n_chars_redacted"))
  }
}
