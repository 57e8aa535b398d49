package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic-draw idiom of the engine, in one place: the first
  * 8 md5 hex digits of s"$tag:$id" as a 32-bit uniform long. md5 is
  * byte-identical in DuckDB (`CAST('0x' || substr(md5(...), 1, 8) AS
  * BIGINT)`), so every consumer — generator value domains, multimodal
  * fake metadata, sampling/splitting/sharding draws — is
  * partitioning-independent, replay-stable, and oracle-checkable.
  * Widening or re-seeding this hash is a cross-operator breaking change;
  * do it here or not at all. */
object Hash {
  def h8(tag: String, id: Column): Column =
    conv(substring(md5(concat(lit(s"$tag:"), id.cast("string"))), 1, 8),
      16, 10).cast("long")
}
