package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining eight TPC-H shapes (Q2, Q9, Q11, Q12, Q16, Q19, Q20,
  * Q21), completing the full 22-query suite alongside
  * [[Relational.tpchQ1]]…[[Relational.tpchQ22]].
  *
  * Fixture deviations (same ratified policy as Q4/Q22, SURVEY §7.4): the
  * fixtures ship no `partsupp` table and no
  * commit/receipt/shipmode/container columns, so each query keeps its
  * STRUCTURAL shape — the correlated-min subquery of Q2, the
  * disjunctive OR-of-ANDs join predicate of Q19, the exists/not-exists
  * self-join of Q21 — re-anchored on columns the fixtures do carry:
  *   - the part–supplier supply relation is DERIVED from lineitem
  *     (distinct (l_partkey, l_suppkey) pairs, with min line price as
  *     the supply-cost analog);
  *   - "late" lines are `l_returnflag = 'R'` (as Q4 already ratified);
  *   - supplier cuts go through the bounded REGION dim, not a single
  *     nation — at sf0.001 the 10-supplier fixture leaves most nations
  *     empty, which would make a nation-cut query vacuously green.
  * Every money comparison stays in the exact integer-cents discipline
  * (round(x·100) as long; ONE trailing IEEE division) so Spark and the
  * DuckDB oracle can never diverge by a ULP at a threshold.
  */
object Tpch {

  /** Exact ×10⁴ revenue term `price_c · (100 − disc_c)` — shared with
    * [[Relational]]'s TPC-H tier. */
  private def rev4: Column =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  /** Suppliers of one region with their nation name — the bounded
    * nation⨝region dim broadcasts; supplier itself scales with SF so
    * its join strategy is AQE's call. */
  private def regionSuppliers(spark: SparkSession, dir: String,
                              region: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .where(col("r_name") === region)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))

  /** TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    * region supplier(s) achieving the minimum supply cost — the classic
    * correlated-MIN subquery, decorrelated into a per-part aggregate
    * joined back on (partkey, cost = min_cost). Supply relation analog:
    * per (l_partkey, l_suppkey) the MIN line price in cents (exact
    * long), derived from lineitem since the fixture has no partsupp.
    * Shape for scale: the part filter left-semi-prunes lineitem BEFORE
    * the pair aggregate (part is SF-scaled → no forced broadcast, AQE
    * decides); the pair aggregate map-side-combines 4 lines/order down
    * to one row per pair; the min join-back runs on the already-compact
    * pair frame. Top-100 plans as TakeOrderedAndProject over a total
    * order ((s_name, p_partkey) is unique), so the cut is
    * deterministic in both engines. */
  def tpchQ2(spark: SparkSession, dir: String,
             region: String = "EUROPE",
             maxSize: Int = 25,
             pType: String = "STANDARD"): DataFrame = {
    val p = Tables.part(spark, dir)
      .where(col("p_size") <= maxSize && col("p_type") === pType)
      .select(col("p_partkey"), col("p_name"))
    val rs = regionSuppliers(spark, dir, region)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(p.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(rs.select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("price_c")).as("cost_c"))
    val minCost = pairs.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("cost_c")).as("min_cost_c"))
    pairs
      .join(minCost, col("l_partkey") === col("m_partkey") &&
        col("cost_c") === col("min_cost_c"))
      .join(rs, col("l_suppkey") === col("s_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        (col("cost_c").cast("double") / 100).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc,
        col("s_name").asc, col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q9 (product-type profit): profit by supplier nation and order
    * year over parts matching a name pattern. Cost analog (no
    * ps_supplycost in the fixture): `p_retailprice · l_quantity`, so
    * profit4 = rev4 − retail_c·qty·100 — all exact ×10⁴ longs, one
    * trailing division. The name filter prunes part BEFORE its join
    * (LIKE pushes to the scan as a string-contains); part and supplier
    * scale with SF → no forced broadcasts, only the 25-row nation dim
    * broadcasts. Big shuffles: partkey, orderkey, suppkey joins —
    * key-partitioned, the correct 100 TB shape. ≤ 25·7 output groups. */
  def tpchQ9(spark: SparkSession, dir: String,
             namePattern: String = "%widget%"): DataFrame = {
    val p = Tables.part(spark, dir)
      .where(col("p_name").like(namePattern))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("retail_c"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"), rev4.as("rev4"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg((sum(col("rev4") - col("retail_c") * col("qty") * 100L)
        .cast("double") / 10000).as("sum_profit"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q11 (important stock): part values held by one region's
    * suppliers that exceed a threshold fraction of the total — the
    * HAVING-vs-global-scalar-subquery shape. Value analog: Σ price_c·qty
    * per part over the region suppliers' lines (exact long). The
    * reference's fixed fraction is SCALED BY SF (0.0001/SF) precisely
    * because a constant fraction empties as the part count grows — the
    * scale-free equivalent here keeps parts worth more than `mult`×
    * the AVERAGE part value (`value_c · n > mult · total_c`,
    * cross-multiplied ALL-INTEGER so the boundary is exact in both
    * engines; a fixed fraction returned 0 rows from sf0.01 up — the
    * size-derived-parameter trap VERDICT r7 closed). The global
    * (total, count) re-aggregates the compact per-part frame and
    * broadcasts as one row; no window, no second lineitem scan. */
  def tpchQ11(spark: SparkSession, dir: String,
              region: String = "EUROPE",
              mult: Long = 2L): DataFrame = {
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          col("l_quantity").cast("long")).as("vc"))
      .join(regionSuppliers(spark, dir, region).select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(col("vc")).as("value_c"))
    val total = vals.agg(sum(col("value_c")).as("total_c"),
      count(lit(1)).as("n_parts"))
    // Overflow discipline: the cross-multiplied boundary is the first
    // place the exact-integer contract can exceed Long range at large
    // SF (value_c ~ 10¹¹·SF, n_parts ~ 2·10⁵·SF ⇒ products approach
    // 2⁶³ around SF ~ 50–100). Spark (non-ANSI) would WRAP silently
    // while DuckDB's SUM promotes to HUGEINT — a silent divergence, not
    // an error. assert_true makes the bound loud: past it, fail the job
    // with instructions, never emit wrapped comparisons. The bounds use
    // integer FLOOR division (DIV) — float '/' would round Long.MaxValue
    // to 2^63 as a double and admit values a few ulps past the true
    // floor bound, letting the subsequent long multiply wrap after all
    // (ADVICE r10); DIV on non-negative operands is exact, so the guard
    // is conservative by construction.
    val inRange = q11InRange(mult)
    val guard = assert_true(inRange, lit(
      "tpch_q11: cross-multiplied threshold exceeds Long range at this SF; " +
      "switch to comparing value_c against mult * (total_c / n_parts) " +
      "with an explicit rounding argument"))
    vals.crossJoin(broadcast(total))
      .where(coalesce(guard.cast("boolean"), lit(true)) &&
        col("value_c") * col("n_parts") > col("total_c") * mult)
      .select(col("p_partkey"),
        (col("value_c").cast("double") / 100).as("value"))
  }

  /** Q11's Long-range admissibility predicate, factored so the
    * boundary spec can pin its exactness (VERDICT r11 #5): the
    * cross-multiplied HAVING comparison `value_c * n_parts >
    * total_c * mult` is wrap-free iff value_c ≤ ⌊Long.MaxValue /
    * n_parts⌋ and total_c ≤ ⌊Long.MaxValue / mult⌋. Integer FLOOR
    * division (`DIV` — exact on non-negative longs) makes both bounds
    * EXACT: at the bound the product is ≤ 2⁶³−1 by the floor property,
    * one past it the product provably exceeds 2⁶³−1 (⌊M/n⌋·n > M−n, so
    * (⌊M/n⌋+1)·n > M). A float '/' here would round through double and
    * admit values a few ulps past the true floor (ADVICE r10). */
  private[graft] def q11InRange(mult: Long) =
    col("value_c") <= expr(s"CAST(${Long.MaxValue} AS BIGINT) DIV n_parts") &&
      col("total_c") <= lit(Long.MaxValue / mult)

  /** TPC-H Q12 (shipping-priority classes): per line class, how many
    * late lines came from high- vs low-priority orders — the
    * conditional two-way count shape. Fixture mapping: `l_linestatus`
    * stands in for l_shipmode (the low-cardinality lineitem attribute
    * being grouped) and `l_returnflag = 'R'` for the
    * commit<receipt lateness test (Q4's ratified mapping). Both lineitem
    * filters and the year window push to the scan; one orderkey shuffle
    * joins orders; 2 output groups. */
  def tpchQ12(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
  }

  /** TPC-H Q16 (parts/supplier relationship): distinct suppliers able to
    * supply each (brand, type, size) bucket, excluding a blacklisted
    * supplier set — the COUNT(DISTINCT) + NOT-IN (anti-join) shape.
    * Supply relation analog: distinct (l_partkey, l_suppkey) pairs from
    * lineitem; blacklist analog: suppliers with negative balance (the
    * fixture has no comment column for the reference's complaints
    * LIKE). The anti join runs on the compact pair frame BEFORE the
    * part join; the count-distinct shuffles once on the grouping key.
    * Size-bucket filter keeps 8 of 50 sizes — pushes to the part scan. */
  def tpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(spark, dir)
      .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q19 (discounted revenue): the disjunctive OR-of-ANDs join
    * predicate — three (brand, size-range, quantity-range) triples
    * (size stands in for the fixture-absent container). The join stays
    * a HASH join on the p_partkey equi-key with the disjunction applied
    * as a post-join filter — the classic Q19 trap is writing the OR into
    * the join condition and silently falling back to a nested-loop
    * join. The RELAXED bounds implied by the disjunction
    * (qty ∈ [1,30], size ∈ [1,15], brand ∈ {12,23,34}) are additionally
    * pre-applied per side so they push to the parquet scans and shrink
    * the join inputs ~10× before the shuffle. */
  def tpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"), rev4.as("rev4"))
    val p = Tables.part(spark, dir)
      .where(col("p_size") >= 1 && col("p_size") <= 15 &&
        col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("qty").between(1L, 11L)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("qty").between(10L, 20L)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("qty").between(20L, 30L)))
      .agg((sum(col("rev4")).cast("double") / 10000).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20 (potential part promotion): region suppliers whose supply
    * of name-matched parts concentrated in one year — the nested
    * semi-join chain (supplier ⋉ pairs ⋉ part) with a per-pair
    * aggregate threshold. Availability analog (no ps_availqty): a
    * (part, supplier) pair qualifies when MORE THAN HALF its all-time
    * shipped quantity shipped in 1997, cross-multiplied to the
    * all-integer `2·qty97 > total` (the reference's
    * `availqty > 0.5·shipped` threshold keeps the same
    * aggregate-vs-scaled-aggregate form). One conditional-sum aggregate
    * over the part-pruned lines computes both operands in one pass; the
    * qualifying pair set left-semi-prunes the region suppliers. */
  def tpchQ20(spark: SparkSession, dir: String,
              namePattern: String = "small%",
              region: String = "EUROPE"): DataFrame = {
    val p = Tables.part(spark, dir)
      .where(col("p_name").like(namePattern)).select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"),
        (year(col("l_shipdate")) === 1997).as("in97"))
      .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(when(col("in97"), col("qty")).otherwise(0L)).as("qty97"),
        sum(col("qty")).as("total_qty"))
      .where(col("qty97") * 2L > col("total_qty"))
      .select(col("l_suppkey")).distinct()
    regionSuppliers(spark, dir, region)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting): for finished orders,
    * region suppliers whose line was late while EVERY OTHER supplier on
    * the order delivered — the exists(other supplier) AND NOT
    * exists(other late supplier) double correlated subquery. Fixture
    * mapping: late ≙ `l_returnflag = 'R'` (Q4's ratified stand-in),
    * finished ≙ `o_orderstatus = 'F'`. Decorrelated for scale: ONE
    * per-order aggregate computes (distinct suppliers, distinct LATE
    * suppliers) — exists ⟺ n_supps > 1, not-exists ⟺ n_late_supps = 1
    * (the probe line itself is late) — replacing the reference's two
    * extra lineitem self-joins with one compact aggregate joined back
    * on orderkey. Top-100 over (numwait desc, s_name) is total —
    * TakeOrderedAndProject, deterministic cut. */
  def tpchQ21(spark: SparkSession, dir: String,
              region: String = "EUROPE"): DataFrame = {
    val fOrders = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val perOrder = Tables.lineitem(spark, dir)
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey").as("a_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_late_supps"))
      .where(col("n_supps") > 1L && col("n_late_supps") === 1L)
      .select(col("a_orderkey"))
    val lateLines = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(perOrder, col("l_orderkey") === col("a_orderkey"), "left_semi")
    lateLines
      .join(regionSuppliers(spark, dir, region)
        .select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }
}
