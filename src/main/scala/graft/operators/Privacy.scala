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

  /** Demo query over `documents`: the fixture corpus contains no PII, so
    * each doc gets a deterministic synthetic contact line appended
    * (derived from doc_id — the DuckDB oracle constructs the identical
    * string) and the redaction pass must find and scrub exactly that.
    * Emits count columns and the md5 of the redacted text (small, exact). */
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
