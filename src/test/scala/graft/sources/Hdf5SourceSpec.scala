package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.types._

import graft.SparkSpec

/** HDF5 / netCDF-4 reader round trip: the spec hand-writes HDF5-format bytes
  * per the public spec (the [[NcSourceSpec]] / ZarrSourceSpec validation
  * model — no libhdf5 in this environment) and pins the decode:
  *  - profile A: superblock v0, v1 object headers (+ a continuation block),
  *    symbol-table root group, contiguous and chunked+shuffle+deflate
  *    datasets, fill values, BE integers, a phony netCDF dimension dataset;
  *  - profile B: superblock v3, OHDR v2 root with Link messages, a
  *    variable-length string in the global heap.
  */
class Hdf5SourceSpec extends SparkSpec {

  private val UNDEF = -1L

  /** Little-endian append buffer with absolute patching. */
  private final class W {
    val buf = new ArrayBuffer[Byte]()
    def pos: Int = buf.size
    def u8(v: Int): Unit = buf += v.toByte
    def u16(v: Int): Unit = { buf += v.toByte; buf += (v >> 8).toByte }
    def u32(v: Long): Unit = (0 until 4).foreach(i => buf += (v >> (8 * i)).toByte)
    def u64(v: Long): Unit = (0 until 8).foreach(i => buf += (v >> (8 * i)).toByte)
    def raw(b: Array[Byte]): Unit = buf ++= b
    def ascii(s: String): Unit = raw(s.getBytes("ASCII"))
    def zeros(n: Int): Unit = (0 until n).foreach(_ => buf += 0)
    def align8(): Unit = while (pos % 8 != 0) buf += 0
    def patchU64(at: Int, v: Long): Unit =
      (0 until 8).foreach(i => buf(at + i) = (v >> (8 * i)).toByte)
    def bytes: Array[Byte] = buf.toArray
  }

  private def le64(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(v); b.array
  }
  private def leD(v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putDouble(v); b.array
  }

  // ----------------------------------------------------------- messages

  /** One v1 header message: type, then 8-aligned body. */
  private def msg(typ: Int, body: Array[Byte]): Array[Byte] = {
    val padded = body ++ new Array[Byte]((8 - body.length % 8) % 8)
    val out = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putShort(typ.toShort); out.putShort(padded.length.toShort)
    out.put(0.toByte); out.put(new Array[Byte](3)); out.put(padded)
    out.array
  }

  private def dataspace(dims: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(dims.size.toByte); b.put(0.toByte); b.put(new Array[Byte](5))
    dims.foreach(b.putLong)
    b.array
  }

  private def dtFixed(size: Int, signed: Boolean, be: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte) // version 1, class 0
    b.put((((if (signed) 0x08 else 0) | (if (be) 0x01 else 0))).toByte)
    b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    b.putShort(0.toShort); b.putShort((size * 8).toShort)
    b.array
  }

  private def dtFloat64: Array[Byte] = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte) // version 1, class 1
    b.put(0x20.toByte); b.put(0x3f.toByte); b.put(0.toByte) // IEEE LE bit fields
    b.putInt(8)
    b.putShort(0.toShort); b.putShort(64.toShort)
    b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte)
    b.putInt(1023)
    b.array
  }

  private def dtString(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(size)
    b.array
  }

  private def dtVlenStr: Array[Byte] = {
    // class 9 version 1, type=string(1); base type = 1-byte string
    val base = dtString(1)
    val b = ByteBuffer.allocate(8 + base.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x19.toByte); b.put(0x01.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(16)
    b.put(base)
    b.array
  }

  private def fillV3(value: Option[Array[Byte]]): Array[Byte] = value match {
    case Some(v) =>
      val b = ByteBuffer.allocate(6 + v.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(0x20.toByte); b.putInt(v.length); b.put(v)
      b.array
    case None => Array[Byte](3, 0)
  }

  private def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte); b.put(1.toByte); b.putLong(addr); b.putLong(size)
    b.array
  }

  private def layoutChunked(btreeAddr: Long, chunkDims: Seq[Int],
                            elemSize: Int): Array[Byte] = {
    val nd = chunkDims.size + 1
    val b = ByteBuffer.allocate(3 + 8 + 4 * nd).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte); b.put(2.toByte); b.put(nd.toByte); b.putLong(btreeAddr)
    chunkDims.foreach(d => b.putInt(d)); b.putInt(elemSize)
    b.array
  }

  private def filterPipelineV1(filters: Seq[(Int, Seq[Long])]): Array[Byte] = {
    val parts = filters.map { case (id, vals) =>
      val b = ByteBuffer.allocate(8 + vals.size * 4 + (if (vals.size % 2 == 1) 4 else 0))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(id.toShort); b.putShort(0.toShort); b.putShort(0.toShort)
      b.putShort(vals.size.toShort)
      vals.foreach(v => b.putInt(v.toInt))
      if (vals.size % 2 == 1) b.putInt(0)
      b.array
    }
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.put(1.toByte); head.put(filters.size.toByte); head.put(new Array[Byte](6))
    head.array ++ parts.flatten
  }

  private def attrV1(name: String, dt: Array[Byte], ds: Array[Byte],
                     data: Array[Byte]): Array[Byte] = {
    def pad8(a: Array[Byte]): Array[Byte] = a ++ new Array[Byte]((8 - a.length % 8) % 8)
    val nameB = name.getBytes("ASCII") ++ Array[Byte](0)
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte)
    b.putShort(nameB.length.toShort); b.putShort(dt.length.toShort)
    b.putShort(ds.length.toShort)
    b.array ++ pad8(nameB) ++ pad8(dt) ++ pad8(ds) ++ data
  }

  private def strAttr(name: String, value: String): Array[Byte] = {
    val v = value.getBytes("ASCII") ++ Array[Byte](0)
    attrV1(name, dtString(v.length), dataspace(Seq.empty), v)
  }

  /** v1 object header from messages; returns bytes (caller appends at an
    * 8-aligned position). `contFrom` splits the tail messages into a
    * continuation block appended AFTER the main header. */
  private def objectHeaderV1(w: W, messages: Seq[Array[Byte]],
                             contSplit: Int = Int.MaxValue): Int = {
    w.align8()
    val addr = w.pos
    val (main, cont) = messages.splitAt(contSplit)
    val contMsgBytes = cont.flatten.toArray
    val contMsg = if (cont.isEmpty) None else Some(new Array[Byte](8 + 16)) // placeholder
    val mainSize = main.map(_.length).sum + (if (cont.isEmpty) 0 else 24)
    w.u8(1); w.u8(0)
    w.u16(messages.size + (if (cont.isEmpty) 0 else 1))
    w.u32(1) // ref count
    w.u32(mainSize)
    w.zeros(4)
    main.foreach(m => w.raw(m))
    var contPatch = -1
    if (cont.nonEmpty) {
      // continuation message: type 0x0010, body = offset(8) + length(8)
      w.u16(0x0010); w.u16(16); w.u8(0); w.zeros(3)
      contPatch = w.pos
      w.u64(0); w.u64(contMsgBytes.length.toLong)
    }
    if (cont.nonEmpty) {
      w.align8()
      val contAddr = w.pos
      w.raw(contMsgBytes)
      w.patchU64(contPatch, contAddr.toLong)
    }
    addr
  }

  // ------------------------------------------------ profile A fixture

  /** Old-style file: superblock v0 + symbol-table root group. */
  private def buildProfileA(): Array[Byte] = {
    val w = new W
    // ---- superblock v0
    w.raw(Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
    w.u8(0); w.u8(0); w.u8(0); w.u8(0) // versions
    w.u8(0); w.u8(8); w.u8(8); w.u8(0) // shared ver, offsets, lengths, reserved
    w.u16(4); w.u16(16) // leaf k, internal k
    w.u32(0) // consistency flags
    w.u64(0); w.u64(UNDEF); w.u64(UNDEF); w.u64(UNDEF) // base, fs, EOF, driver
    // root symbol table entry
    w.u64(0) // link name offset
    val rootOhPatch = w.pos; w.u64(0)
    w.u32(1); w.u32(0) // cached stab
    val stabBtreePatch = w.pos; w.u64(0)
    val stabHeapPatch = w.pos; w.u64(0)

    // ---- datasets
    val timeVals = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val nT = timeVals.length
    // time: f8 contiguous with CF units attrs
    w.align8(); val timeDataAddr = w.pos
    timeVals.foreach(v => w.raw(leD(v)))
    val timeOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq(nT.toLong))),
      msg(0x0003, dtFloat64),
      msg(0x0008, layoutContiguous(timeDataAddr.toLong, nT * 8L)),
      msg(0x000C, strAttr("units", "hours since 1990-01-01")),
      msg(0x000C, strAttr("calendar", "proleptic_gregorian"))))

    // tas: f8 CHUNKED (chunk 4) + shuffle + deflate + fill, attrs in a
    // continuation block; value 3 is the fill, value 4 is NaN
    val fill = 9.96921e36
    val tasVals = Array(10.5, 11.5, 12.5, fill, Double.NaN, 15.5)
    val chunkSz = 4
    val chunkAddrs = tasVals.grouped(chunkSz).zipWithIndex.map { case (chunk, ci) =>
      val raw = chunk.flatMap(leD).toArray
      val padded = raw ++ new Array[Byte]((chunkSz - chunk.length) * 8) // full chunk
      val shuffled = {
        val n = padded.length / 8
        val out = new Array[Byte](padded.length)
        for (j <- 0 until 8; i <- 0 until n) out(j * n + i) = padded(i * 8 + j)
        out
      }
      val defl = {
        val d = new java.util.zip.Deflater()
        d.setInput(shuffled); d.finish()
        val tmp = new Array[Byte](shuffled.length * 2 + 64)
        val k = d.deflate(tmp); d.end()
        java.util.Arrays.copyOf(tmp, k)
      }
      w.align8(); val a = w.pos; w.raw(defl)
      (ci * chunkSz, defl.length, a)
    }.toSeq
    w.align8(); val tasBtree = w.pos
    w.ascii("TREE"); w.u8(1); w.u8(0); w.u16(chunkAddrs.size)
    w.u64(UNDEF); w.u64(UNDEF)
    chunkAddrs.foreach { case (off, sz, addr) =>
      w.u32(sz.toLong); w.u32(0); w.u64(off.toLong); w.u64(0) // key
      w.u64(addr.toLong) // child
    }
    w.u32(0); w.u32(0); w.u64(nT.toLong); w.u64(0) // final key
    val tasOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq(nT.toLong))),
      msg(0x0003, dtFloat64),
      msg(0x0005, fillV3(Some(leD(fill)))),
      msg(0x000B, filterPipelineV1(Seq(2 -> Seq(8L), 1 -> Seq(6L)))),
      msg(0x0008, layoutChunked(tasBtree.toLong, Seq(chunkSz), 8)),
      msg(0x000C, strAttr("long_name", "air temperature")),
      msg(0x000C, attrV1("_FillValue", dtFloat64, dataspace(Seq.empty), leD(fill)))),
      contSplit = 5) // long_name + _FillValue land in a continuation block

    // qc: big-endian int16 contiguous, fill = -999 -> null
    val qcVals = Array[Short](1, 2, -999, 4, 5, 6)
    w.align8(); val qcDataAddr = w.pos
    qcVals.foreach { v => w.u8((v >> 8) & 0xff); w.u8(v & 0xff) } // BE on disk
    val qcOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq(nT.toLong))),
      msg(0x0003, dtFixed(2, signed = true, be = true)),
      msg(0x0005, fillV3(Some(Array(0xFC.toByte, 0x19.toByte)))), // -999 BE
      msg(0x0008, layoutContiguous(qcDataAddr.toLong, nT * 2L))))

    // station: fixed string scalar
    val st = "KSEA-01\u0000".getBytes("ASCII")
    w.align8(); val stDataAddr = w.pos; w.raw(st)
    val stOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq.empty)),
      msg(0x0003, dtString(st.length)),
      msg(0x0008, layoutContiguous(stDataAddr.toLong, st.length.toLong))))

    // phony netCDF dimension dataset (must be dropped)
    w.align8(); val phonyDataAddr = w.pos
    timeVals.foreach(v => w.raw(leD(v)))
    val phonyOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq(nT.toLong))),
      msg(0x0003, dtFloat64),
      msg(0x0008, layoutContiguous(phonyDataAddr.toLong, nT * 8L)),
      msg(0x000C, strAttr("NAME",
        "This is a netCDF dimension but not a netCDF variable."))))

    // root group object header: symbol table message
    w.align8()
    val rootOh = w.pos
    w.u8(1); w.u8(0); w.u16(1); w.u32(1); w.u32(24); w.zeros(4)
    w.u16(0x0011); w.u16(16); w.u8(0); w.zeros(3)
    val rootStabBtreePatch = w.pos; w.u64(0)
    val rootStabHeapPatch = w.pos; w.u64(0)

    // local heap: names
    val names = Seq("phony_dim", "qc", "station", "tas", "time")
    w.align8(); val heapHdr = w.pos
    w.ascii("HEAP"); w.u8(0); w.zeros(3)
    val heapSizePatch = w.pos; w.u64(0)
    w.u64(UNDEF) // free list
    val heapDataPatch = w.pos; w.u64(0)
    w.align8(); val heapData = w.pos
    w.u64(0) // offset 0 reserved (empty root link name)
    val nameOffsets = names.map { n =>
      val off = w.pos - heapData
      w.ascii(n); w.u8(0); w.align8()
      n -> off.toLong
    }.toMap
    w.patchU64(heapSizePatch, (w.pos - heapData).toLong)
    w.patchU64(heapDataPatch, heapData.toLong)

    // SNOD with the five entries (sorted by name)
    w.align8(); val snod = w.pos
    w.ascii("SNOD"); w.u8(1); w.u8(0); w.u16(names.size)
    val ohOf = Map("time" -> timeOh, "tas" -> tasOh, "qc" -> qcOh,
      "station" -> stOh, "phony_dim" -> phonyOh)
    names.foreach { n =>
      w.u64(nameOffsets(n)); w.u64(ohOf(n).toLong)
      w.u32(0); w.u32(0); w.zeros(16)
    }

    // B-tree leaf for the group
    w.align8(); val btree = w.pos
    w.ascii("TREE"); w.u8(0); w.u8(0); w.u16(1)
    w.u64(UNDEF); w.u64(UNDEF)
    w.u64(0) // key 0
    w.u64(snod.toLong)
    w.u64(nameOffsets(names.last)) // key 1

    w.patchU64(rootOhPatch, rootOh.toLong)
    w.patchU64(stabBtreePatch, btree.toLong)
    w.patchU64(stabHeapPatch, heapHdr.toLong)
    w.patchU64(rootStabBtreePatch, btree.toLong)
    w.patchU64(rootStabHeapPatch, heapHdr.toLong)
    w.bytes
  }

  // ------------------------------------------------ profile B fixture

  /** New-style file: superblock v3, OHDR v2 root group with Link messages,
    * vlen-string station in the global heap. */
  private def buildProfileB(): Array[Byte] = {
    val w = new W
    w.raw(Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
    w.u8(3); w.u8(8); w.u8(8); w.u8(0)
    w.u64(0); w.u64(UNDEF)
    val eofPatch = w.pos; w.u64(0)
    val rootPatch = w.pos; w.u64(0)
    w.u32(0) // checksum (not verified by the reader)

    val timeVals = Array(0.0, 1.0, 2.0)
    val nT = timeVals.length
    w.align8(); val timeDataAddr = w.pos
    timeVals.foreach(v => w.raw(leD(v)))
    val timeOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq(nT.toLong))),
      msg(0x0003, dtFloat64),
      msg(0x0008, layoutContiguous(timeDataAddr.toLong, nT * 8L)),
      msg(0x000C, strAttr("units", "days since 2000-01-01"))))

    val pr = Array(1.5, 2.5, 3.5)
    w.align8(); val prDataAddr = w.pos
    pr.foreach(v => w.raw(leD(v)))
    val prOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq(nT.toLong))),
      msg(0x0003, dtFloat64),
      msg(0x0008, layoutContiguous(prDataAddr.toLong, nT * 8L))))

    // global heap with the station string
    val stStr = "B-STATION-9".getBytes("ASCII")
    w.align8(); val gheap = w.pos
    w.ascii("GCOL"); w.u8(1); w.zeros(3)
    val heapLen = 16 + 16 + ((stStr.length + 7) & ~7)
    w.u64(heapLen.toLong)
    w.u16(1); w.u16(1); w.zeros(4); w.u64(stStr.length.toLong)
    w.raw(stStr); w.align8()
    // vlen descriptor dataset (scalar)
    w.align8(); val stDataAddr = w.pos
    w.u32(stStr.length.toLong); w.u64(gheap.toLong); w.u32(1)
    val stOh = objectHeaderV1(w, Seq(
      msg(0x0001, dataspace(Seq.empty)),
      msg(0x0003, dtVlenStr),
      msg(0x0008, layoutContiguous(stDataAddr.toLong, 16L))))

    // root OHDR v2 with link messages
    def linkMsg(name: String, target: Long): Array[Byte] = {
      val nb = name.getBytes("ASCII")
      val b = ByteBuffer.allocate(2 + 1 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(0.toByte) // version, flags: 1-byte name length
      b.put(nb.length.toByte); b.put(nb); b.putLong(target)
      b.array
    }
    val links = Seq(linkMsg("pr", prOh.toLong), linkMsg("station", stOh.toLong),
      linkMsg("time", timeOh.toLong))
    // v2 messages: type(1), size(2), flags(1), data — no creation-order tracking
    val v2msgs = links.map { l =>
      val b = ByteBuffer.allocate(4 + l.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x06.toByte); b.putShort(l.length.toShort); b.put(0.toByte); b.put(l)
      b.array
    }
    val chunk0 = v2msgs.map(_.length).sum + 4 // + checksum
    w.align8(); val rootOh = w.pos
    w.ascii("OHDR"); w.u8(2); w.u8(0x01) // flags: 2-byte chunk0 size
    w.u16(chunk0)
    v2msgs.foreach(m => w.raw(m))
    w.u32(0) // checksum (not verified)

    w.patchU64(rootPatch, rootOh.toLong)
    w.patchU64(eofPatch, w.pos.toLong)
    w.bytes
  }

  // -------------------------------------------------------------- tests

  test("profile A: v0 superblock, symbol-table group, chunked+shuffled+deflated data") {
    val data = Hdf5Source.readStation(buildProfileA(), "stationA.nc")
    assert(data.station == "KSEA-01")
    // CF units: hours since 1990-01-01
    val epoch1990 = java.time.Instant.parse("1990-01-01T00:00:00Z").getEpochSecond * 1000000L
    assert(data.time.toSeq == (0 until 6).map(h => epoch1990 + h * 3600L * 1000000L))
    val cols = data.cols.map(c => c._1 -> c).toMap
    // phony dimension dataset dropped
    assert(!cols.contains("phony_dim"))
    // chunked tas: fill -> null, NaN -> null, edge chunk decoded
    assert(cols("tas")._2 == DoubleType)
    assert(cols("tas")._3.toSeq == Seq(10.5, 11.5, 12.5, null, null, 15.5))
    // BE int16 with fill
    assert(cols("qc")._2 == LongType)
    assert(cols("qc")._3.toSeq == Seq(1L, 2L, null, 4L, 5L, 6L))
    // attrs survive (incl. the continuation-block long_name), _FillValue dropped
    assert(data.attrs.forVar("tas")("long_name") == "air temperature")
    assert(!data.attrs.forVar("tas").contains("_FillValue"))
    assert(data.attrs.forVar("time")("calendar") == "proleptic_gregorian")
  }

  test("profile B: v3 superblock, OHDR v2 link messages, vlen-string station") {
    val data = Hdf5Source.readStation(buildProfileB(), "stationB.nc")
    assert(data.station == "B-STATION-9")
    val epoch2000 = java.time.Instant.parse("2000-01-01T00:00:00Z").getEpochSecond * 1000000L
    assert(data.time.toSeq == Seq(0L, 1L, 2L).map(d => epoch2000 + d * 86400L * 1000000L))
    assert(data.cols.map(_._1) == Seq("pr"))
    assert(data.cols.head._3.toSeq == Seq(1.5, 2.5, 3.5))
  }

  test("NcSource dispatches HDF5 transparently; distributed read round-trips") {
    // same entry the classic files use
    val viaNc = NcSource.readStation(buildProfileA(), "stationA.nc")
    assert(viaNc.station == "KSEA-01")
    // distributed path over a written file
    val dir = java.nio.file.Files.createTempDirectory("h5src").toFile
    val f = new java.io.File(dir, "stationA.nc")
    java.nio.file.Files.write(f.toPath, buildProfileA())
    val df = NcSource.readFiles(spark, Seq(f.getAbsolutePath))
    assert(df.count() == 6)
    assert(df.filter(org.apache.spark.sql.functions.col("tas").isNull).count() == 2)
    val first = df.orderBy("time").select("station", "tas").collect().head
    assert(first.getString(0) == "KSEA-01" && first.getDouble(1) == 10.5)
  }
}
