package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The PlanAuditSpec trap pins re-asserted at sf1 (VERDICT r9 #7): AQE
  * choices are SCALE-DEPENDENT — a side that broadcasts at the 6 MB
  * fixture can cross the broadcast threshold at 10× and flip the join
  * strategy, so a pin that only ever sees sf0.001 cannot catch a trap
  * that exists only at scale (the r9 ×10 addendum observed exactly such
  * broadcast flips on the TPC-H tier). The sf1-equivalent fixture is
  * MINTED once per machine (graft.tools.MintSf, ×10 of sf0.1,
  * key-shifted copies — join fanouts exactly the base's) and cached
  * under /tmp; the three classic trap queries then run TO COMPLETION at
  * sf1 and their FINAL adaptive plans are pinned.
  *
  * Runtime cost: one ~60 s mint on first run (cached after), plus three
  * sf1 query executions (~15 s) — the price of pinning post-AQE plans,
  * which only exist after execution. */
class PlanAuditSf1Spec extends SparkSpec {

  private lazy val sf1Dir: String = {
    val out = "/tmp/graft_sf1_planaudit"
    val marker = new java.io.File(s"$out/_MINTED")
    if (!marker.exists()) {
      // A partial mint (crashed run) would fail errorifexists — clear it.
      val root = new java.io.File(out)
      if (root.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(root)
      }
      graft.tools.MintSf.mint(spark, SparkSpec.Sf01, out, 10)
      marker.createNewFile()
    }
    out
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def count(plan: String, re: String): Int =
    re.r.findAllIn(plan).size
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf1Dir)

  test("sf1: Q19's disjunctive predicate still plans a hash join (no BNLJ/cartesian)") {
    val p19 = finalPlan(q("q_tpch_q19"))
    assert(!p19.contains("BroadcastNestedLoopJoin") &&
      !p19.contains("CartesianProduct"),
      s"q_tpch_q19 fell off the hash join at sf1:\n$p19")
    assert(count(p19, "Join") >= 1, s"q_tpch_q19 at sf1:\n$p19")
  }

  test("sf1: Q16's blacklist anti join survives on the logical plan") {
    // Logical, not physical: AQE deletes an anti join whose build side
    // is provably empty — at sf1 the blacklist is non-empty, but the
    // LOGICAL pin is the invariant stated scale-independently.
    val df16 = q("q_tpch_q16")
    val l16 = df16.queryExecution.optimizedPlan.toString
    assert(l16.contains("LeftAnti"),
      s"q_tpch_q16 lost its anti join at sf1:\n$l16")
    val p16 = finalPlan(df16)
    assert(!p16.contains("BroadcastNestedLoopJoin") &&
      !p16.contains("CartesianProduct"),
      s"q_tpch_q16 planned a nested loop at sf1:\n$p16")
  }

  test("sf1: Q21 keeps the one-aggregate decorrelation and heap top-k") {
    val p21 = finalPlan(q("q_tpch_q21"))
    assert(p21.contains("TakeOrderedAndProject"),
      s"q_tpch_q21 lost its top-k heaps at sf1:\n$p21")
    assert(count(p21, "Exchange rangepartitioning") == 0,
      s"q_tpch_q21 grew a global sort at sf1:\n$p21")
    assert(count(p21, "Scan parquet [^\\n]*lineitem") <= 2,
      s"q_tpch_q21 scans lineitem more than its two passes at sf1:\n$p21")
    assert(!p21.contains("BroadcastNestedLoopJoin") &&
      !p21.contains("CartesianProduct"),
      s"q_tpch_q21 planned a nested loop at sf1:\n$p21")
  }
}
