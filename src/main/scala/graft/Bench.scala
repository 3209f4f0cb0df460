package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session bring-up, codegen and parquet-footer costs otherwise
    // land on whichever query sorts first and distort its number
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => () }
    // (name, seconds, errorOrNull): failures are REPORTED, never silently folded
    // into the total as fast runs (round-1 bug: 9 crashed queries looked like 0.1s wins).
    // args, when given, select a query subset (scale smokes bench the heavy tail only).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else {
        val unknown = args.toSet -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"unknown queries: $unknown")
        SparkEntry.queries.view.filterKeys(args.toSet).toMap
      }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      val sec = (System.nanoTime() - t0) / 1e9
      // queries that pin intermediates (LSH signature tables, pipeline stages) must
      // not hold memory against later queries — each query is timed self-contained
      spark.catalog.clearCache()
      (name, sec, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._3.isDefined)
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
