package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{CleanOps, SpikeOps}
import graft.pipeline.QaqcPipeline
import graft.sources.{Sinks, ZarrSource}

/** The full reference-user journey composed end-to-end: published zarr corpus →
  * [[ZarrSource.ingest]] → engine obs layout (attrs sidecar intact) → the ordered
  * QAQC stage fold → per-station CSV export with the `#`-metadata header. Each leg
  * is pinned individually elsewhere; this spec pins that they COMPOSE — the first
  * thing a real adopter does. */
class AdopterJourneySpec extends SparkSpec {

  test("zarr corpus -> ingest -> QAQC flags -> station CSV with metadata header") {
    // --- 1. a tiny published corpus: two consolidated zarr stores
    val corpus = Files.createTempDirectory("journey_zarr")
    def writeStore(name: String, tas: Seq[Double]): String = {
      val dir = corpus.resolve(name)
      Files.createDirectories(dir)
      val n = tas.size
      val meta =
        s"""{"metadata":{".zgroup":{"zarr_format":2},
           |".zattrs":{"title":"journey fixture","institution":"graft"},
           |"station/.zarray":{"chunks":[1],"compressor":null,"dtype":"<U8","fill_value":null,"filters":null,"order":"C","shape":[1],"zarr_format":2},
           |"station/.zattrs":{"_ARRAY_DIMENSIONS":["station"]},
           |"time/.zarray":{"chunks":[$n],"compressor":null,"dtype":"<i8","fill_value":null,"filters":null,"order":"C","shape":[$n],"zarr_format":2},
           |"time/.zattrs":{"_ARRAY_DIMENSIONS":["time"],"units":"hours since 2001-01-01"},
           |"tas/.zarray":{"chunks":[$n],"compressor":null,"dtype":"<f8","fill_value":"NaN","filters":null,"order":"C","shape":[$n],"zarr_format":2},
           |"tas/.zattrs":{"_ARRAY_DIMENSIONS":["time"],"units":"K","long_name":"air temperature"}},
           |"zarr_consolidated_format":1}""".stripMargin.replaceAll("\n", "")
      Files.write(dir.resolve(".zmetadata"), meta.getBytes("UTF-8"))
      def put(rel: String, b: Array[Byte]): Unit = {
        Files.createDirectories(dir.resolve(rel).getParent)
        Files.write(dir.resolve(rel), b)
      }
      val sb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      name.stripSuffix(".zarr").foreach(ch => sb.putInt(ch.toInt))
      put("station/0", sb.array())
      val tb = java.nio.ByteBuffer.allocate(8 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach(i => tb.putLong(i.toLong))
      put("time/0", tb.array())
      val vb = java.nio.ByteBuffer.allocate(8 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tas.foreach(vb.putDouble)
      put("tas/0", vb.array())
      dir.toString
    }
    // STA: sane values with one world-record breach (350 K > 329.9 K hot bound)
    val a = writeStore("STA.zarr", Seq(280.0, 281.0, 350.0, 282.0, 283.0))
    val b = writeStore("STB.zarr", Seq(290.0, 291.0, 292.0, 291.5, 290.5))

    // --- 2. ingest into the engine's partitioned obs layout
    val obsDir = Files.createTempDirectory("journey_obs").toString + "/obs"
    ZarrSource.ingest(spark, Seq(a, b), obsDir, network = "JOURNEY")
    val obs = spark.read.parquet(obsDir)
    assert(obs.count() == 10)
    val attrs = Sinks.readAttrs(obs, obsDir)
    assert(attrs.global("title") == "journey fixture")
    assert(attrs.forVar("tas")("units") == "K")

    // --- 3. the ordered QAQC fold (world-record bounds stage flags the breach)
    val flagged = QaqcPipeline.run(
      obs.withColumn("tas_eraqc", lit(null).cast("int")),
      Seq(QaqcPipeline.Stage("world_record", Seq(core.Flags.WorldRecord),
        df => CleanOps.flagOutOfBounds(df, "tas", "tas_eraqc", 183.2, 329.9))))
    val hits = flagged.filter(col("tas_eraqc").isNotNull)
      .select("station", "tas").collect()
    assert(hits.length == 1 && hits.head.getString(0) == "STA" && hits.head.getDouble(1) == 350.0)

    // --- 4. per-station CSV export with the #-metadata header
    val csvDir = Files.createTempDirectory("journey_csv").toString + "/STA"
    Sinks.exportStationCsv(flagged, "STA", csvDir,
      attrs = Some(attrs), network = "JOURNEY")
    val part = new java.io.File(csvDir).listFiles().find(_.getName.startsWith("part-")).get
    val lines = Files.readAllLines(part.toPath)
    assert(lines.get(0) == "# STATION: STA")
    assert(lines.asInstanceOf[java.util.List[String]].toArray.exists(
      _.toString == "# VAR tas.units: K"))
    // header + csv header row + 5 observation rows, time-sorted
    val dataLines = (0 until lines.size()).map(lines.get).filterNot(_.startsWith("#"))
    assert(dataLines.length == 6 && dataLines.head.startsWith("station"))
  }

  test("pipe4 platform slice moves the corpus through exactly one shuffle") {
    // clean -> concat/dedup -> flag -> hourly -> report as one plan: the explicit
    // station repartition satisfies the (station,time) window and the
    // (station,hour) groupBy by the subset-key clustering rule, so the ONLY
    // other exchange is the network-cardinality report agg
    val plan = SparkEntry.queries("pipe4_platform_slice")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 2, s"expected 2 exchanges (1 corpus + 1 report), got:\n$plan")
  }
}
