package graft

import org.apache.spark.sql.functions._
import graft.expressions.VecMean
import graft.operators.Similarity

/** §2.9 UDAF: the typed VecMean Aggregator agrees with the
  * oracle-checked explode + hash-aggregate centroid path, works through
  * SQL registration, and keeps built-in null semantics. */
class UdafSpec extends SparkSpec {

  private def vecsByLabel = Tables.embeddings(spark, sf0001)
    .select(col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  test("vec_mean == labelCentroids explode path (both rounded 6dp)") {
    val viaUdaf = vecsByLabel
      .groupBy(col("label"))
      .agg(VecMean.asUdf(col("v")).as("centroid"))
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"), round(col("x"), 6).as("mean_x"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val viaExplode = Similarity.labelCentroids(spark, sf0001)
      .select(col("label"), col("dim"), col("mean_x"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(viaUdaf.nonEmpty && viaUdaf == viaExplode)
  }

  test("vec_mean registers as a SQL function and partial-merges") {
    VecMean.register(spark)
    vecsByLabel.repartition(7).createOrReplaceTempView("vm_in") // force merge path
    val n = spark.sql(
      """SELECT label, vec_mean(v) AS c FROM vm_in GROUP BY label""")
      .where(size(col("c")) === lit(Similarity.Dim))
      .count()
    assert(n == vecsByLabel.select(col("label")).distinct().count())
  }

  test("vec_mean ignores nulls AND empties; degenerate groups yield null") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1.0, 3.0))), (1, None), (1, Some(Seq(3.0, 5.0))),
      (2, Option.empty[Seq[Double]]),
      (3, Some(Seq.empty[Double])), (3, Some(Seq(2.0, 4.0))),
      (4, Some(Seq.empty[Double])))
      .toDF("g", "v")
    val out = df.groupBy(col("g")).agg(VecMean.asUdf(col("v")).as("c"))
      .collect().map(r => (r.getInt(0), Option(r.getSeq[Double](1)))).toMap
    assert(out(1).contains(Seq(2.0, 4.0)))
    assert(out(2).isEmpty)
    // An empty vector fixes no dimension and must not deflate the mean.
    assert(out(3).contains(Seq(2.0, 4.0)))
    assert(out(4).isEmpty)
  }
}
