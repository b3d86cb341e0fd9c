package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage-level timing for x77 (residual IVF×PQ), which benches ~14× its
  * x76 sibling (r10 idle record: 13.7 s vs 0.96 s median) — find the
  * stage that carries it. Usage: sbt "runMain graft.tools.DiagX77 [sfDir]" */
object DiagX77 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diagx77] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // cold full runs, clearing caches between
    for (i <- 1 to 3) {
      graft.ext.ExtCaches.clearCaches()
      time(s"x77 full cold rep$i") {
        graft.queries.Extensions.x77_sim_topk_ivf_pq_residual(spark, dir).count()
      }
    }
    graft.ext.ExtCaches.clearCaches()
    for (i <- 1 to 3) {
      graft.ext.ExtCaches.clearCaches()
      time(s"x76 full cold rep$i") {
        graft.queries.Extensions.x76_sim_topk_ivf_pq(spark, dir).count()
      }
    }
    // stage bisect (cold, x73/x74 geometry constants as the registry uses)
    import graft.ext.{ExtCaches, Similarity}
    import graft.queries.Extensions._
    graft.ext.ExtCaches.clearCaches()
    val e = graft.tables.Tables.embeddings(spark, dir)
    val q = ExtCaches.persistTracked(
      e.select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("v")))
    val stats = time("trainedCellStats") {
      val s = Similarity.trainedCellStats(q, ScaledCells, ScaledLloydRounds)
      s.count(); s
    }
    val probes = time("probesFromStats") {
      val p = ExtCaches.persistTracked(
        Similarity.probesFromStats(q, stats, ScaledNprobe))
      p.count(); p
    }
    val cent = Similarity.roundedCentroids(stats)
    val resRel = time("resRel") {
      val r = ExtCaches.persistTracked(
        probes.filter(col("probe_rank") === 1).select(col("id"), col("cell"))
          .join(q, Seq("id"))
          .join(broadcast(cent), Seq("cell"))
          .select(col("id"), col("cell"),
            zip_with(col("v"), col("cbar"), (a, b) => a - b).as("v")))
      r.count(); r
    }
    val (coded, anchor, _) = time("pqTrainEncode(resRel)") {
      val t = Similarity.pqTrainEncode(resRel.select(col("id"), col("v")),
        PqM, PqCodes, PqLloydRounds, EmbeddingDims)
      t._1.count(); t
    }
    println(s"[diagx77] coded rows = " + coded.count() +
      ", anchor rows = " + anchor.count())
    // the x77 tail, replicated with the same relations
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val subW = EmbeddingDims / PqM
    val queryIds = e.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("id"))
    val qsv = q
      .join(broadcast(queryIds), Seq("id"))
      .select(col("id"),
        posexplode(array((0 until PqM).map(s =>
          slice(col("v"), s * subW + 1, subW)): _*)).as(Seq("sub", "sv")))
    val lutRows = time("lutRows") {
      val l = qsv.join(broadcast(anchor))
        .select(col("id").as("q_id"), col("sub"),
          Similarity.pqTerms(PqCodes).as("terms"))
        .groupBy(col("q_id"))
        .agg(transform(array_sort(collect_list(struct(col("sub"), col("terms")))),
          x => x("terms")).as("lut"))
      l.count(); l
    }
    val qp = time("qp (bias join)") {
      val r = probes
        .join(broadcast(queryIds), Seq("id"))
        .join(q, Seq("id"))
        .join(broadcast(cent), Seq("cell"))
        .select(col("id").as("q_id"), col("cell"),
          Similarity.dotQ(col("v"), col("cbar")).as("bias"))
        .join(lutRows, Seq("q_id"))
      r.count(); r
    }
    val members = resRel.select(col("id"), col("cell")).join(coded, Seq("id"))
    val qpP = ExtCaches.persistTracked(qp)
    qpP.count()
    val scored = members.join(broadcast(qpP), Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("cell"), col("id").as("c_id"),
        (Seq(col("bias").cast(DoubleType)) ++ (0 until PqM).map { s =>
          element_at(filter(element_at(col("lut"), s + 1),
            t => t("code") === element_at(col("code"), s + 1)), 1)("term")
        }).reduce(_ + _).as("score_pq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("score_pq"), col("c_id"))
    val ranked = scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 3)
    time("scored+window rep1 (qp persisted)") { ranked.count() }
    time("scored+window rep2 (all warm)") { ranked.count() }
    time("scored.count (no window)") { scored.count() }
    // bias-only projection: is the m-term lookup expression the cost?
    val biasOnly = members.join(broadcast(qpP), Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("cell"), col("id").as("c_id"),
        col("bias").cast(DoubleType).as("score_pq"))
    time("bias-only scored.count") { biasOnly.count() }
    // one-term projection
    val oneTerm = members.join(broadcast(qpP), Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .select(
        element_at(filter(element_at(col("lut"), 1),
          t => t("code") === element_at(col("code"), 1)), 1)("term").as("t0"))
    time("one-term scored.count") { oneTerm.count() }
    time("members.count rep1") { members.count() }
    time("members.count rep2") { members.count() }
    time("resRel.count again") { resRel.count() }
    time("coded.count again") { coded.count() }
    time("qpP.count again") { qpP.count() }
    val membersP = ExtCaches.persistTracked(members)
    time("membersP fill") { membersP.count() }
    val scored2 = membersP.join(broadcast(qpP), Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("bias").cast(DoubleType).as("s"))
    time("scored over membersP") { scored2.count() }
    def cacheUse(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val scans = "InMemoryTableScan".r.findAllIn(p).length
      println(s"[diagx77] $tag executedPlan: $scans InMemoryTableScans, " +
        s"${p.linesIterator.length} plan lines")
    }
    cacheUse("coded", coded)
    cacheUse("qpP", qpP)
    cacheUse("scored2", scored2)
    spark.stop()
  }
}
