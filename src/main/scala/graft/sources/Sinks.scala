package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S7/S9/S11 — sinks. The reference's delete-then-write zarr store per station
  * (`QAQC_pipeline.py:345-368`, `MERGE_pipeline.py:413-468`) becomes ONE partitioned
  * columnar table; its tiny CSV reports/ledgers stay driver-side single files.
  */
object Sinks {

  /** S7 — partitioned columnar writer: overwrite-by-partition (dynamic), partitioned
    * by `network`, sorted within files by (station, time) so min/max stats prune
    * station predicates.
    *
    * The shuffle key is (partition cols, hash(first sort col) mod filesPerPartition):
    * hashing by the partition column ALONE would send each network to a single task
    * (one writer per network at 100 TB); the salt spreads a network over up to
    * `filesPerPartition` writers while keeping any one station's rows in one file,
    * so station min/max pruning stays tight. */
  def writeObs(df: DataFrame, path: String, partitionCols: Seq[String] = Seq("network"),
               sortCols: Seq[String] = Seq("station", "time"),
               filesPerPartition: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val salt = pmod(hash(col(sortCols.head)), lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ salt: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** S9 — small report sink (flag counts, rates, ledgers): tiny aggregates → one CSV
    * file with header, like the reference's `to_csv` reports. */
  def writeReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S11 — per-station CSV export (`data-access/zarr_to_csv.py:58-160`): one station's
    * rows, time-sorted. The station filter prunes on partition/min-max stats before
    * anything is read. */
  def exportStationCsv(obs: DataFrame, stationId: String, path: String,
                       stationCol: String = "station", timeCol: String = "time"): Unit =
    obs.filter(col(stationCol) === stationId)
      .orderBy(col(timeCol))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}
