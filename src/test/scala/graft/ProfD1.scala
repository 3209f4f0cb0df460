package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness, not committed
object ProfD1 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }

    // full d1 as benched
    for (i <- 1 to 3)
      time(s"d1 full #$i") { SparkEntry.queries("d1_dedup_exact")(spark, sfDir).count() }

    // pieces
    import graft.text.TextOps
    import graft.dedup.DedupOps
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    time("scan+repart count") { docs.count() }
    time("text10 build only") {
      docs.withColumn("text10",
        concat_ws(" ", slice(TextOps.tokens(lower(col("text"))), 1, 10))).count()
    }
    time("text10 + fingerprint") {
      docs.withColumn("text10",
        concat_ws(" ", slice(TextOps.tokens(lower(col("text"))), 1, 10)))
        .withColumn("fp", TextOps.fingerprint(col("text10"))).count()
    }
    time("exactDedup on raw text") {
      DedupOps.exactDedup(docs, "doc_id", "text").count()
    }
    time("d1 without repartition") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("text10",
          concat_ws(" ", slice(TextOps.tokens(lower(col("text"))), 1, 10)))
      DedupOps.exactDedup(d, "doc_id", "text10").select(col("doc_id")).count()
    }
    spark.stop()
  }
}
