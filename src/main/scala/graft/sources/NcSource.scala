package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.AttrsTable

/** S5 (netCDF half) — a from-scratch NetCDF-3 CLASSIC (CDF-1/CDF-2) reader for the
  * QAQC stage's `.nc` on-ramp (`/root/reference/scripts/3_qaqc_data/
  * QAQC_pipeline.py:1058-1065`, the `open_dataset` branch the zarr reader doesn't
  * cover). Same one-task-per-station shape as [[ZarrSource]]: one `.nc` file = one
  * station = one executor task, decoded into the shared [[ZarrSource
  * .ZarrStationData]] so the `readStores`/`writeObs` plumbing is identical.
  *
  * Implements the public classic file format (magic `CDF\x01`/`CDF\x02`,
  * big-endian header with dim/attr/var lists, fixed vars at absolute offsets,
  * record vars interleaved per record with the single-record-var no-padding rule).
  * NetCDF-4/HDF5 files dispatch to [[Hdf5Source]] (r11) — `readStation` and the
  * distributed entries accept BOTH container formats, so a mixed clean-stage
  * corpus (xarray default NetCDF-4 next to classic re-saves) reads uniformly.
  */
object NcSource {

  // nc_type codes (public classic spec)
  private val NcByte = 1; private val NcChar = 2; private val NcShort = 3
  private val NcInt = 4; private val NcFloat = 5; private val NcDouble = 6

  // default fill values per type (netcdf.h NC_FILL_*)
  private val FillDouble = 9.969209968386869e+36
  private val FillFloat = 9.9692099683868690e+36f.toDouble
  private val FillInt = -2147483647L
  private val FillShort = -32767L
  private val FillByte = -127L

  final case class NcDim(name: String, length: Int) // length 0 = record dim
  final case class NcVar(name: String, dimIds: Seq[Int], ncType: Int,
                         attrs: Map[String, String], begin: Long) {
    def isRecord(dims: Seq[NcDim]): Boolean =
      dimIds.headOption.exists(dims(_).length == 0)
  }
  final case class NcFile(dims: Seq[NcDim], numRecs: Int,
                          gattrs: Map[String, String], vars: Seq[NcVar])

  // ------------------------------------------------------------------ header

  private final class Reader(bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def int(): Int = bb.getInt()
    def long(): Long = bb.getLong()
    def name(): String = {
      val n = int()
      val s = new String(bytes, bb.position(), n, "UTF-8")
      bb.position(bb.position() + pad4(n))
      s
    }
    def skip(n: Int): Unit = bb.position(bb.position() + n)
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  private def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => sys.error(s"unsupported nc_type $other")
  }

  private def readAttrValues(r: Reader, t: Int, n: Int): String = t match {
    case NcChar =>
      val s = new String(r.bb.array(), r.bb.position(), n, "UTF-8")
      r.skip(pad4(n)); s
    case _ =>
      val vals = (0 until n).map { _ =>
        t match {
          case NcByte => r.bb.get().toString
          case NcShort => r.bb.getShort().toString
          case NcInt => r.int().toString
          case NcFloat => r.bb.getFloat().toString
          case NcDouble => r.bb.getDouble().toString
        }
      }
      r.skip(pad4(n * typeSize(t)) - n * typeSize(t))
      vals.mkString(" ")
  }

  private def readAttrList(r: Reader): Map[String, String] = {
    val tag = r.int(); val n = r.int()
    require(tag == 0x0C || (tag == 0 && n == 0), s"bad attribute list tag $tag")
    (0 until n).map { _ =>
      val nm = r.name(); val t = r.int(); val ne = r.int()
      nm -> readAttrValues(r, t, ne)
    }.toMap
  }

  /** Parse the header of a classic file. */
  def parseHeader(bytes: Array[Byte]): NcFile = {
    require(bytes.length >= 8 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F',
      if (bytes.length >= 4 && bytes(1) == 'H' && bytes(2) == 'D' && bytes(3) == 'F')
        "netCDF-4/HDF5 file — only NetCDF-3 classic is supported (re-save with format='NETCDF3_CLASSIC' or publish zarr)"
      else "not a netCDF classic file (bad magic)")
    val version = bytes(3).toInt
    require(version == 1 || version == 2,
      s"netCDF classic version $version unsupported (CDF-1/CDF-2 only)")
    val r = new Reader(bytes)
    r.skip(4)
    val numRecs = r.int() // -1 = STREAMING, resolved later from file size
    val dimTag = r.int(); val nDims = r.int()
    require(dimTag == 0x0A || (dimTag == 0 && nDims == 0), s"bad dimension list tag $dimTag")
    val dims = (0 until nDims).map(_ => NcDim(r.name(), r.int()))
    val gattrs = readAttrList(r)
    val varTag = r.int(); val nVars = r.int()
    require(varTag == 0x0B || (varTag == 0 && nVars == 0), s"bad variable list tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val nm = r.name()
      val nd = r.int()
      val dimIds = (0 until nd).map(_ => r.int())
      val attrs = readAttrList(r)
      val t = r.int()
      r.int() // vsize (recomputed below — spec says ignore for large files)
      val begin = if (version == 1) r.int().toLong else r.long()
      NcVar(nm, dimIds, t, attrs, begin)
    }
    NcFile(dims, numRecs, gattrs, vars)
  }

  // -------------------------------------------------------------------- data

  /** Per-record byte size of a record variable (product of non-record dims). */
  private def recordChunk(nc: NcFile, v: NcVar): Int =
    v.dimIds.drop(1).map(nc.dims(_).length).product * typeSize(v.ncType)

  /** Total record stride: padded per-record chunks, EXCEPT when there is exactly
    * one record variable (classic-format special case: no padding). */
  private def recordStride(nc: NcFile): Int = {
    val rec = nc.vars.filter(_.isRecord(nc.dims))
    if (rec.size == 1) recordChunk(nc, rec.head)
    else rec.map(v => pad4(recordChunk(nc, v))).sum
  }

  private def resolveNumRecs(nc: NcFile, fileLen: Long): Int =
    if (nc.numRecs != -1) nc.numRecs
    else {
      val rec = nc.vars.filter(_.isRecord(nc.dims))
      if (rec.isEmpty) 0
      else ((fileLen - rec.map(_.begin).min) / recordStride(nc)).toInt
    }

  private def decodeOne(bb: ByteBuffer, t: Int): Any = t match {
    case NcByte => bb.get().toLong
    case NcShort => bb.getShort().toLong
    case NcInt => bb.getInt().toLong
    case NcFloat => bb.getFloat().toDouble
    case NcDouble => bb.getDouble()
  }

  private def fillOf(v: NcVar): Option[Any] = v.ncType match {
    case NcChar => None
    case NcFloat => Some(v.attrs.get("_FillValue").map(_.toDouble).getOrElse(FillFloat))
    case NcDouble => Some(v.attrs.get("_FillValue").map(_.toDouble).getOrElse(FillDouble))
    case NcByte => Some(v.attrs.get("_FillValue").map(_.toLong).getOrElse(FillByte))
    case NcShort => Some(v.attrs.get("_FillValue").map(_.toLong).getOrElse(FillShort))
    case NcInt => Some(v.attrs.get("_FillValue").map(_.toLong).getOrElse(FillInt))
  }

  /** Read a variable's values flattened in row-major order; fill values → null;
    * char variables decode their trailing string dimension per element. */
  def readValues(bytes: Array[Byte], nc: NcFile, v: NcVar): Array[Any] = {
    val numRecs = resolveNumRecs(nc, bytes.length.toLong)
    val isRec = v.isRecord(nc.dims)
    val shape = v.dimIds.map(d => if (nc.dims(d).length == 0) numRecs else nc.dims(d).length)
    val strLen = if (v.ncType == NcChar && v.dimIds.nonEmpty)
      nc.dims(v.dimIds.last).length max 1 else 1
    val nElems =
      if (v.ncType == NcChar) (shape.product / strLen) max (if (shape.isEmpty) 1 else 0)
      else shape.product
    val fill = fillOf(v)
    val out = new ArrayBuffer[Any](nElems)

    def decodeRun(bb: ByteBuffer, n: Int): Unit = {
      var i = 0
      while (i < n) {
        if (v.ncType == NcChar) {
          val raw = new Array[Byte](strLen)
          bb.get(raw)
          val s = new String(raw, "UTF-8").takeWhile(_ != '\u0000').trim
          out += (if (s.isEmpty) null else s)
        } else {
          val x = decodeOne(bb, v.ncType)
          out += (if (fill.contains(x) ||
            (x.isInstanceOf[Double] && x.asInstanceOf[Double].isNaN)) null else x)
        }
        i += 1
      }
    }

    if (!isRec) {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      bb.position(v.begin.toInt)
      decodeRun(bb, nElems)
    } else {
      val stride = recordStride(nc)
      val perRec = if (v.ncType == NcChar) (shape.drop(1).product / strLen) max 1
        else shape.drop(1).product max 1
      var rec = 0
      while (rec < numRecs) {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        bb.position((v.begin + rec.toLong * stride).toInt)
        decodeRun(bb, perRec)
        rec += 1
      }
    }
    out.toArray
  }

  private def sparkType(v: NcVar): DataType = v.ncType match {
    case NcChar => StringType
    case NcFloat | NcDouble => DoubleType
    case _ => LongType
  }

  // --------------------------------------------------------------- station read

  /** Decode one classic `.nc` file into the shared station-data shape (driver- or
    * executor-side; bounded by one station's bytes — the reference's own task
    * granularity). Time comes from the CF `units` attr of the `time` variable;
    * the station id from a `station` char variable or the file name. */
  def readStation(bytes: Array[Byte], fileName: String): ZarrSource.ZarrStationData = {
    // NetCDF-4 files are HDF5 containers — dispatch them to the from-scratch
    // HDF5 reader (r11; previously refused). Classic CDF-1/CDF-2 stays here.
    if (Hdf5Source.isHdf5(bytes)) return Hdf5Source.readStation(bytes, fileName)
    val nc = parseHeader(bytes)
    val timeVar = nc.vars.find(_.name == "time")
      .getOrElse(sys.error("no time variable"))
    val timeRaw = readValues(bytes, nc, timeVar)
    val time = ZarrSource.timeToMicros(timeRaw, "<f8", timeVar.attrs)
    val station = nc.vars.find(v => v.name == "station" && v.ncType == NcChar)
      .flatMap(v => readValues(bytes, nc, v).headOption.map(_.toString))
      .getOrElse(fileName.stripSuffix(".nc"))
    val dataVars = nc.vars.filterNot(v => v.name == "time" || v.name == "station")
    val cols = dataVars.flatMap { v =>
      val vals = readValues(bytes, nc, v)
      // keep per-timestep columns; singleton non-time vars broadcast to all rows
      if (vals.length == time.length) Some((v.name, sparkType(v), vals))
      else if (vals.length == 1) Some((v.name, sparkType(v),
        Array.fill[Any](time.length)(vals(0))))
      else None
    }
    val attrs = AttrsTable(nc.gattrs,
      nc.vars.map(v => v.name -> (v.attrs - "_FillValue")).toMap)
    ZarrSource.ZarrStationData(station, time, cols, attrs)
  }

  // ------------------------------------------------------------- distributed

  private def readBytes(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len < Int.MaxValue, s"$path: classic file too large for one task")
    val in = fs.open(p)
    try { val buf = new Array[Byte](len.toInt); in.readFully(0, buf); buf }
    finally in.close()
  }

  /** Read many `.nc` files distributed — one task per file, no shuffle; schema
    * from the first file, column-by-name alignment (missing → null) exactly like
    * [[ZarrSource.readStores]]. */
  def readFiles(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no nc paths")
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val first = readStation(readBytes(paths.head, conf), new Path(paths.head).getName)
    val schema = ZarrSource.storeSchema(first)
    val varOrder = first.cols.map(_._1)
    val confPairs = spark.sparkContext.broadcast(
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq)
    val rows = spark.sparkContext
      .parallelize(paths, math.min(paths.size, 1024))
      .flatMap { p =>
        val c = new Configuration(false)
        confPairs.value.foreach { case (k, v) => c.set(k, v) }
        val d = readStation(readBytes(p, c), new Path(p).getName)
        val byName = d.cols.map(c0 => c0._1 -> c0._3).toMap
        (0 until d.time.length).iterator.map { i =>
          Row.fromSeq(
            d.station +:
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
              d.time(i) / 1000000L, (d.time(i) % 1000000L) * 1000L)) +:
            varOrder.map(v => byName.get(v).map(_(i)).orNull))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** `.nc` corpus → the engine's partitioned obs table (the full on-ramp, mirror of
    * [[ZarrSource.ingest]]). */
  def ingest(spark: SparkSession, paths: Seq[String], outPath: String,
             network: String): Unit = {
    val df = readFiles(spark, paths)
      .withColumn("network", org.apache.spark.sql.functions.lit(network))
    val attrs = readStation(
      readBytes(paths.head, spark.sparkContext.hadoopConfiguration),
      new Path(paths.head).getName).attrs
    Sinks.writeObs(df, outPath, attrs = Some(attrs))
  }
}
