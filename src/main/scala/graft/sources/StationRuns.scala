package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared distributed-writer chassis for the per-station sinks ([[ZarrSink]],
  * [[NcSink]]): one hash-shuffle on `station`, a per-partition sort on
  * `(station, time)`, then each task streams consecutive same-station runs into
  * `(station, time[], columns)` batches and hands them to the format encoder.
  * This is the write-side mirror of `readStores`' one-task-per-station read
  * granularity — at 1e5 stations the stores fan out across the cluster with no
  * driver involvement and no second shuffle. */
private[sources] object StationRuns {

  val ledgerSchema: StructType = StructType(Seq(
    StructField("station", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("chunks", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  /** Run `write(station, timeMicros, cols, conf)` once per station (cols carry
    * Double/Long/String values with nulls; narrower numerics widen). Returns the
    * ledger rows the callback emits, as a DataFrame. */
  def mapStations(df: DataFrame)(
      write: (String, Array[Long], Seq[(String, DataType, Array[Any])],
              Configuration) => Row): DataFrame = {
    val spark = df.sparkSession
    require(df.columns.contains("station") && df.columns.contains("time"),
      "per-station sink needs station + time columns")
    val dataCols = df.schema.fields.filter(f => f.name != "station" && f.name != "time")
    val confPairs = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toSeq)

    val shuffled = df
      .repartition(col("station"))
      .sortWithinPartitions(col("station"), col("time"))
      .select((col("station") +: col("time").cast(TimestampType) +:
        dataCols.map(f => col(f.name))): _*)

    val ledger = shuffled.queryExecution.toRdd.mapPartitions { it =>
      val conf = new Configuration(false)
      confPairs.value.foreach { case (k, v) => conf.set(k, v) }
      val colTypes = dataCols.map(_.dataType)
      // consecutive run of one station = one store (partition is sorted)
      new Iterator[Row] {
        private val src = it.map { internal =>
          val station = internal.getUTF8String(0).toString
          val micros = internal.getLong(1) // TimestampType = epoch micros
          val vals: Array[Any] = colTypes.zipWithIndex.map { case (dt, i) =>
            (if (internal.isNullAt(i + 2)) null
            else dt match {
              case DoubleType => java.lang.Double.valueOf(internal.getDouble(i + 2))
              case FloatType => java.lang.Double.valueOf(internal.getFloat(i + 2).toDouble)
              case LongType => java.lang.Long.valueOf(internal.getLong(i + 2))
              case IntegerType => java.lang.Long.valueOf(internal.getInt(i + 2).toLong)
              case ShortType => java.lang.Long.valueOf(internal.getShort(i + 2).toLong)
              case ByteType => java.lang.Long.valueOf(internal.getByte(i + 2).toLong)
              case StringType => internal.getUTF8String(i + 2).toString
              case other => sys.error(s"unsupported per-station sink type $other")
            }): Any
          }
          (station, micros, vals)
        }.buffered
        def hasNext: Boolean = src.hasNext
        def next(): Row = {
          val station = src.head._1
          val times = scala.collection.mutable.ArrayBuffer.empty[Long]
          val data = Array.fill(colTypes.length)(
            scala.collection.mutable.ArrayBuffer.empty[Any])
          while (src.hasNext && src.head._1 == station) {
            val (_, micros, vals) = src.next()
            times += micros
            var i = 0
            while (i < vals.length) { data(i) += vals(i); i += 1 }
          }
          val cols = dataCols.zipWithIndex.map { case (f, i) =>
            val dt = f.dataType match {
              case FloatType => DoubleType
              case IntegerType | ShortType | ByteType => LongType
              case other => other
            }
            (f.name, dt, data(i).toArray)
          }.toSeq
          write(station, times.toArray, cols, conf)
        }
      }
    }
    spark.createDataFrame(ledger, ledgerSchema)
  }

  /** Write one store's files under `root` through the Hadoop FS (works for
    * local, HDFS, and object stores alike); returns total bytes. */
  def writeFiles(rootPath: String, conf: Configuration,
                 files: Seq[(String, Array[Byte])]): Long = {
    val root = new Path(rootPath)
    localRoot(root, conf) match {
      case Some(dir) =>
        files.map { case (rel, bytes) =>
          val f = dir.resolve(rel)
          java.nio.file.Files.createDirectories(f.getParent)
          java.nio.file.Files.write(f, bytes)
          bytes.length.toLong
        }.sum
      case None =>
        val fs = root.getFileSystem(conf)
        files.map { case (rel, bytes) =>
          val out = fs.create(new Path(root, rel), true)
          try out.write(bytes) finally out.close()
          bytes.length.toLong
        }.sum
    }
  }

  /** For `file:`/schemeless paths, the direct java.nio path: Hadoop's
    * LocalFileSystem both writes a `.crc` sidecar per file AND — with no
    * native-hadoop library loaded — forks a `chmod` process per create to
    * apply permissions, a ~1.5 ms tax that dominates many-small-file store
    * formats (zarr: measured 1.8 s of a 2.0 s store publish). HDFS/object
    * stores keep the Hadoop client, whose per-create cost is the network
    * round-trip anyway. */
  private def localRoot(p: Path, conf: Configuration): Option[java.nio.file.Path] = {
    val uri = p.toUri
    val schemeLocal = uri.getScheme == null || uri.getScheme == "file"
    val defaultLocal = org.apache.hadoop.fs.FileSystem.getDefaultUri(conf)
      .getScheme match { case null | "file" => true; case _ => false }
    if (schemeLocal && (uri.getScheme != null || defaultLocal))
      Some(java.nio.file.Paths.get(uri.getPath))
    else None
  }

  /** Write one flat file. */
  def writeFile(path: String, conf: Configuration, bytes: Array[Byte]): Long = {
    val p = new Path(path)
    localRoot(p, conf) match {
      case Some(f) =>
        if (f.getParent != null) java.nio.file.Files.createDirectories(f.getParent)
        java.nio.file.Files.write(f, bytes)
      case None =>
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
    }
    bytes.length.toLong
  }
}
