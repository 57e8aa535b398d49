package graft
/** Dev profiling scratchpad (not part of the driver contract).
  *
  * r17 optimization round: A/B of the customer-retention aggregate forms
  * (shipped two-phase no-Expand vs the spec-twin Expand form) over the
  * same master frame — the ×100 evidence for OPTIMIZATION_r17.md ch.1.
  * Bench protocol envs apply (SPARK_GRAFT_CPUS, TQ_SF). */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("TQ_SF", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min ${ts.min}%.2f s  reps " +
        ts.map(t => f"$t%.2f").mkString("/"))
    }
    import graft.operators.Relational
    def master = Relational.masterModel(spark, d)
    time("warmup")(Relational.customerRetention(master))
    time("two_phase (shipped)")(Relational.customerRetention(master))
    time("expand (old form)")(Relational.customerRetentionExpand(master))
    // Same-JVM A/B of the source-authority forms: the shipped one-job
    // closed-form recurrence vs a verbatim replica of the r10–r16
    // per-iteration probed/checkpointed loop (box drift between runs
    // made cross-run comparison of this row uninterpretable).
    import org.apache.spark.sql.functions._
    import graft.operators.{Graph, Dedup}
    // One PINNED overlap frame shared by both arms so the A/B isolates
    // the iteration loop (the edge-prep subtree is identical either way).
    val overlap = Dedup.sourceOverlap(spark, d).localCheckpoint()
    def nodesIn = graft.Tables.documents(spark, d).select(col("source"))
    def oldAuthority(): org.apache.spark.sql.DataFrame = {
      val ov = overlap.where(col("source_a") =!= col("source_b"))
      val edges = ov.select(col("source_a").as("src"),
          col("source_b").as("dst"), col("n_dup_pairs").as("w"))
        .unionAll(ov.select(col("source_b").as("src"),
          col("source_a").as("dst"), col("n_dup_pairs").as("w")))
      val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      val shares = edges.join(outw, "src")
        .select(col("src"), col("dst"),
          expr(s"(w * ${Graph.ShareScale}) DIV ow").as("share"))
        .localCheckpoint()
      val srcs = shares.select(col("src")).distinct()
      val ns = nodesIn.select(col("source")).distinct()
        .join(srcs, col("source") === col("src"), "left")
        .select(col("source"), col("src").isNull.as("dangling"))
        .localCheckpoint()
      val n = ns.count()
      val teleport =
        (Graph.Scale * (Graph.DampDen - Graph.DampNum) / Graph.DampDen) / n
      var ranks = ns.withColumn("r", lit(Graph.Scale / n)).localCheckpoint()
      for (_ <- 1 to Graph.Iterations) {
        val dang = ranks.where(col("dangling"))
          .agg(coalesce(sum(expr(
            s"(r * ${Graph.DampNum}) DIV ${Graph.DampDen}")), lit(0L)))
          .head().getLong(0)
        val inMass = shares
          .join(ranks.select(col("source").as("src"), col("r")), "src")
          .select(col("dst"),
            expr(s"(((r * ${Graph.DampNum}) DIV ${Graph.DampDen}) * share)" +
              s" DIV ${Graph.ShareScale}").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("m"))
        ranks = ns.join(inMass, ns("source") === inMass("dst"), "left")
          .select(col("source"), col("dangling"),
            (lit(teleport) + coalesce(col("m"), lit(0L)) + lit(dang / n))
              .as("r"))
          .localCheckpoint()
      }
      ranks.select(col("source"), col("r").as("rank_micro"),
        (col("r").cast("double") / lit(Graph.Scale.toDouble))
          .as("authority"))
    }
    time("authority shipped")(Graph.authorityFrom(nodesIn, overlap))
    time("authority old loop")(oldAuthority())
    time("authority shipped2")(Graph.authorityFrom(nodesIn, overlap))
    time("authority old loop2")(oldAuthority())
    spark.stop()
  }
}
