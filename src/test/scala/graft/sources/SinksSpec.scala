package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("S7: partitioned writer round-trips with partition pruning intact") {
    val dir = Files.createTempDirectory("obs").toFile.getAbsolutePath + "/obs"
    val df = Seq(
      ("ASOS", "s1", 1L, 10.0), ("ASOS", "s2", 2L, 11.0),
      ("MADIS", "s3", 1L, 12.0))
      .toDF("network", "station", "time", "tas")
    Sinks.writeObs(df, dir, filesPerPartition = 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // partition pruning: only the ASOS directory is scanned
    val plan = back.filter(col("network") === "ASOS").queryExecution.executedPlan.toString
    assert(!plan.contains("MADIS"))
    assert(back.filter(col("network") === "ASOS").count() == 2)
    // dynamic overwrite replaces only the touched partition
    Sinks.writeObs(Seq(("ASOS", "s9", 3L, 13.0)).toDF("network", "station", "time", "tas"), dir)
    val after = spark.read.parquet(dir)
    assert(after.filter(col("network") === "MADIS").count() == 1) // untouched
    assert(after.filter(col("network") === "ASOS").count() == 1) // replaced
  }

  test("S9/S11: CSV report and per-station export") {
    val tmp = Files.createTempDirectory("csv").toFile.getAbsolutePath
    val report = Seq(("11", 5L), ("no_flag", 95L)).toDF("flag", "cnt")
    Sinks.writeReport(report, s"$tmp/report")
    assert(spark.read.option("header", "true").csv(s"$tmp/report").count() == 2)
    val obs = Seq(("s1", 2L, 1.0), ("s1", 1L, 2.0), ("s2", 1L, 3.0))
      .toDF("station", "time", "tas")
    Sinks.exportStationCsv(obs, "s1", s"$tmp/s1")
    val back = spark.read.option("header", "true").csv(s"$tmp/s1")
    assert(back.count() == 2) // station filter applied
    assert(back.head().getString(1) == "1") // time-sorted
  }
}
