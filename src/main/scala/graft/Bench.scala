package graft
object Bench {
  /** The headline set: the reference workload's own 26 queries (the
    * surface BASELINE measures — SURVEY §2.12). The engine's extension
    * queries (s12+, x*) are timed too, but under "extended"; folding them
    * into the headline total would compare a 49-query run against a
    * 26-query baseline. */
  val Headline: Set[String] = Set(
    "q01_dup", "q01_null", "q02_top_parts_usa", "q03_demographics",
    "q04_rev_by_geo", "q05_top_cust_per_country", "q06_top_part_per_cust",
    "q07_purchase_trends", "q08_churn_rate", "q09_genre_sales",
    "q09_top_brands", "q10_multi_genre_cust", "q11_genre_rank",
    "q12_inactive", "s01_parts_to_promote", "s02_top_genres_non_usa",
    "s03_old_vs_new", "s04_affinity_genre", "s04_affinity_brand",
    "s04_affinity_part", "s05_regional_churn", "s05_regional_behavior",
    "s06_risk_profile", "s07_clv", "s10_schema_evolution",
    "s11_country_metrics")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    // Warm-up: initialize parquet reader, codegen compiler, shuffle system
    // once so the first timed query doesn't absorb one-time JVM setup.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    def run(names: Seq[String]): Seq[(String, Double)] = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val all = SparkEntry.queries.keys.toSeq.sorted
    val headline = run(all.filter(Headline))
    val extended = run(all.filterNot(Headline))
    def obj(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${headline.map(_._2).sum},"unit":"sec",""" +
      s""""queries":${obj(headline)},"extended":${obj(extended)},""" +
      s""""extended_total":${extended.map(_._2).sum},"sf":"$sfDir","errors":$errs}""")
    spark.stop()
  }
}
