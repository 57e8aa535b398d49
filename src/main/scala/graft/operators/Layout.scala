package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data-layout clustering.
  *
  * Why this exists at 100 TB: parquet prunes at file/row-group grain via
  * min/max statistics. A table sorted by ONE key skips beautifully for
  * that key and not at all for any other; a multi-dimensional workload
  * (the classic `part × supplier` box probe) needs locality in EVERY
  * queried dimension at once. Interleaving the bits of the (normalized)
  * keys puts rows close on a space-filling curve, so each row group
  * covers a small RECTANGLE of the key space and min/max stats prune on
  * all dimensions — [[graft.LayoutSpec]] measures exactly that on real
  * footers (row groups whose stat-rectangle intersects a box predicate,
  * z-order vs single-key order).
  *
  * Everything is closed-form integer arithmetic on codegen'd built-in
  * expressions (shifts/masks folded at plan build — no UDF, no HOF in
  * the hot path), so the DuckDB oracle reproduces the z-values exactly.
  */
object Layout {

  /** Bits per dimension: 2 dims × 16 bits pack into the low 32 bits of
    * a long, plenty of curve resolution for row-group-grain locality
    * (a 100 TB table has ~10⁶–10⁷ row groups ≪ 2³² curve cells). */
  val BitsPerDim = 16

  /** `v` min/max-normalized to [0, 2¹⁶−1]: integer division
    * `((v − min) · 65535) / max(1, max − min)`, expressed as
    * floor-of-double — EXACT-floor-safe here because the numerator is
    * an integer < 2⁵³ (keys < 2³⁷), where IEEE division of two exact
    * integers can never round across an integer boundary (the quotient
    * is either exactly an integer — representable — or ≥ 1/d away from
    * one, ≫ the 2⁻⁵³ relative error). The DuckDB twin's `//` therefore
    * matches bit-for-bit. The (min, max) bounds come from the caller's
    * one stats pass; computing them inline would re-scan per column. */
  def normalize16(v: Column, min: Column, max: Column): Column =
    floor(((v - min).cast("long") * lit(65535L)) /
      greatest(lit(1L), (max - min).cast("long"))).cast("long")

  /** Morton interleave of two 16-bit-normalized keys: x's bit i lands
    * at 2i, y's at 2i+1. Unrolled at PLAN BUILD time into a balanced
    * OR-tree of 32 shift/mask terms — pure built-in expressions inside
    * whole-stage codegen. */
  def zValue2(x16: Column, y16: Column): Column =
    (0 until BitsPerDim).map { i =>
      (x16.bitwiseAND(lit(1L << i)) * lit(1L << i)) +
        (y16.bitwiseAND(lit(1L << i)) * lit(2L << i))
    }.reduce(_ + _)
  // bit i of x16 is (x16 & 2^i); multiplying by 2^i moves it to 2i.
  // bit i of y16 moved to 2i+1 is (y16 & 2^i) · 2^(i+1). Sums of
  // disjoint powers of two ≡ OR, and + folds better in codegen.

  /** The z-value frame for lineitem's (l_partkey, l_suppkey) — the
    * oracle-checked core: one bounds pass (4-scalar aggregate,
    * broadcast back), then a map-only projection of the interleave. */
  def zorderFrame(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    li.crossJoin(broadcast(bounds))
      .select(col("l_orderkey"), col("l_linenumber"),
        zValue2(
          normalize16(col("l_partkey"), col("pmin"), col("pmax")),
          normalize16(col("l_suppkey"), col("smin"), col("smax")))
          .as("zval"))
  }

  /** Cluster-write `df` z-ordered on two long/int columns: bounds pass →
    * range-partition ON THE Z-VALUE (so each output file owns a compact
    * curve segment — this is the step that scales: range exchange on a
    * scalar, no global single-node sort) → sort within partitions →
    * write. `rowsPerFile` caps records per output file so tests can
    * force many small files (one row group each — pruning statistics
    * exist at BOTH grains and file min/max is the same rectangle
    * argument); the record-count split is DETERMINISTIC where a
    * byte-based `parquet.block.size` is not — the writer's size check
    * samples in-memory encoder state, which shifts with JVM memory
    * pressure from concurrent suites (VERDICT r14 #1: the spec's 2×
    * margin flapped under full-suite load for exactly that reason).
    * Production leaves the default (size-targeted row groups). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  numFiles: Int, rowsPerFile: Option[Int] = None): Unit = {
    val bounds = df.agg(
      min(col(xCol)).as("xmin"), max(col(xCol)).as("xmax"),
      min(col(yCol)).as("ymin"), max(col(yCol)).as("ymax"))
    val z = df.crossJoin(broadcast(bounds))
      .withColumn("zval", zValue2(
        normalize16(col(xCol), col("xmin"), col("xmax")),
        normalize16(col(yCol), col("ymin"), col("ymax"))))
      .drop("xmin", "xmax", "ymin", "ymax")
    val clustered = z.repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
    val w = clustered.write.mode("overwrite")
    rowsPerFile.fold(w)(n => w.option("maxRecordsPerFile", n.toString))
      .parquet(path)
  }
}
