package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.JoinOps

/** §3.3 — co-located station concatenation (`qaqc_concatenate_stations.py:66-556`):
  * stations sharing exact (lat, lon) are merged into one record under the newest
  * station's id; overlapping timestamps keep the newer station's row.
  *
  * The reference loads each group's zarrs and pairwise-reduces in a loop; here the
  * whole fleet is ONE window query (J3 grouping + J4 latest-wins) — no iteration, no
  * per-group I/O.
  */
object ConcatStations {

  /** `stations(idCol, latCol, lonCol, recencyCol)` → mapping of member station id to
    * its group's surviving (newest) id; singleton groups map to themselves. */
  def survivorMapping(stations: DataFrame, idCol: String, latCol: String,
                      lonCol: String, recency: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(latCol), col(lonCol))
    stations.withColumn("survivor_id",
        max_by(col(idCol), recency).over(w))
      .select(col(idCol).as("member_id"), col("survivor_id"))
  }

  /** Apply the merge to observations: rows re-keyed to their survivor id; for
    * duplicate (survivor, time) keys the row from the most recent member wins. */
  def concatObs(obs: DataFrame, stations: DataFrame, idCol: String, latCol: String,
                lonCol: String, timeCol: String, recency: Column): DataFrame = {
    val mapping = survivorMapping(stations, idCol, latCol, lonCol, recency)
      .join(stations.select(col(idCol).as("member_id"), recency.as("_rec")), "member_id")
    val rekeyed = obs
      .join(mapping, obs(idCol) === mapping("member_id"))
      .drop(idCol, "member_id")
      .withColumnRenamed("survivor_id", idCol)
    JoinOps.latestWins(Seq(rekeyed), Seq(idCol, timeCol), col("_rec"))
      .drop("_rec")
  }
}
