package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew handling (SURVEY §4): the reference's CSV flow hardcodes
  * country='Peru' (`cloud_function/create_campaigns/csv/main.py:29`), so
  * the J1 join key is pathologically skewed — one shuffle partition
  * receives most of the fact. AQE's skew-join split covers moderate skew;
  * this explicit salt is the deterministic fallback for the degenerate
  * single-key case.
  */
object Skew {

  /** Inner equi-join with a salted left side: the (skewed) left frame
    * spreads each key over `buckets` sub-keys using a deterministic hash
    * of `spreadBy` (any high-cardinality left column), and the right
    * frame is replicated `buckets`× so every sub-key still meets every
    * matching right row. Row-identical to `left.join(right, keys)` —
    * only the shuffle distribution changes (hot key's rows land on
    * `buckets` tasks instead of one).
    *
    * Cost model: right side is replicated ×buckets, so size the salt for
    * the skew, not bigger (8-64 is typical; replication is map-side and
    * cheap when the right frame is far smaller than the hot partition). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 spreadBy: Column, buckets: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(spreadBy), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
