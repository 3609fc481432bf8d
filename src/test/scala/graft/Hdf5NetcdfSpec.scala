package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.{GridFile, Hdf5Netcdf, NetcdfClassic}

/** NetCDF-4/HDF5 contiguous-slice decoding — the bounded bite of the one
  * remaining input-surface gap. Fixtures are byte-authored by
  * [[Hdf5Netcdf.write]] (a from-spec serializer of superblock v0 +
  * symbol-table group + v1 object headers + contiguous layouts, not a
  * library), then decoded through the SAME DSv2 `gridded` chassis as
  * `.grid` and classic `.nc`: f64/f32 data, `_FillValue` masking, CF time
  * units, column-pruned slice I/O, bit-parity with the `.grid` codec, and
  * LOUD rejection of the out-of-scope dialects (newer superblocks, v2
  * object headers) with messages that name the feature.
  */
class Hdf5NetcdfSpec extends SparkSpec {

  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  // same logical fixture shape as NetcdfClassicSpec: 2t x 2l x 2y x 3x,
  // cell (y=1, x=2) masked everywhere
  private val nT = 2; private val nL = 2; private val nY = 2; private val nX = 3
  private val times = Array(us("2020-06-01 00:00:00"), us("2020-06-08 00:00:00"))
  private def slab(t: Int): Array[Double] = (for {
    l <- 0 until nL; y <- 0 until nY; x <- 0 until nX
  } yield if (y == 1 && x == 2) Double.NaN
          else 0.1 * (t + 1) + 0.01 * l + 0.001 * y + 0.0001 * x).toArray
  private val mean = slab(0) ++ slab(1)
  private val stddev = mean.map(_ / 10)
  private val leads = Array(1, 2)
  private val yc = Array(100.0, 125.0)
  private val xc = Array(200.0, 225.0, 250.0)

  private def readDf(path: String) = spark.read.format("gridded").load(path)

  test("contiguous f64 file: full decode through the DSv2 reader") {
    val p = tmpDir("h5") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev)
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    val r = df.filter(col("leadtime") === 1 && col("yc") === 100.0 &&
      col("xc") === 200.0 &&
      col("time") === Timestamp.valueOf("2020-06-01 00:00:00")).head()
    assert(math.abs(r.getAs[Double]("sic_mean") - 0.1) < 1e-9)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL) // NaN cells
    assert(df.rdd.getNumPartitions == nT) // per-slice planning carries over
  }

  test("f32 data decodes float-exactly; _FillValue cells surface as nulls") {
    val m2 = Array.tabulate(mean.length)(i =>
      if (i % 7 == 0) Double.NaN else (i % 64) / 64.0)
    val p = tmpDir("h5f") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, m2, m2.map(_ / 2),
      floatData = true, fillValue = Some(-999.0))
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() ==
      m2.count(_.isNaN)) // fill-encoded, decoded back to null
    assert(df.filter(col("sic_mean") === -999.0).count() == 0)
    val got = df.filter(col("leadtime") === 2 && col("yc") === 125.0 &&
      col("xc") === 250.0 &&
      col("time") === Timestamp.valueOf("2020-06-08 00:00:00"))
      .head().getAs[Double]("sic_mean")
    assert(got == (mean.length - 1) % 64 / 64.0)
  }

  test("readGridHeader reads dims without touching data") {
    val p = tmpDir("h5h") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev)
    assert(Hdf5Netcdf.readGridHeader(p) == GridFile.Header(nT, nL, nY, nX))
  }

  test("HDF5 .nc and .grid decode to identical DataFrames on same content") {
    val dir = tmpDir("h5parity")
    GridFile.write(s"$dir/a.grid", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev)
    val g = readDf(s"$dir/a.grid").orderBy("time", "leadtime", "yc", "xc").collect()
    val h = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(g.toSeq == h.toSeq)
  }

  test("all three containers union through one directory scan") {
    val dir = tmpDir("h5mixed")
    GridFile.write(s"$dir/a.grid", Array(times(0)), leads, yc, xc,
      slab(0), slab(0).map(_ / 10))
    NetcdfClassic.write(s"$dir/b.nc", Array(times(1)), leads, yc, xc,
      slab(1), slab(1).map(_ / 10))
    val t3 = Array(us("2020-06-15 00:00:00"))
    Hdf5Netcdf.write(s"$dir/c.nc", t3, leads, yc, xc,
      slab(0), slab(0).map(_ / 10))
    val df = readDf(dir)
    assert(df.select("time").distinct().count() == 3)
    assert(df.count() == 3L * nL * nY * nX)
  }

  test("slice reads stay O(slice), not O(file): pruning + seeking guard") {
    val dir = tmpDir("h5seek")
    val t4 = Array.tabulate(4)(i => us(f"2022-01-0${i + 1} 00:00:00"))
    val vals = Array.tabulate(4 * nL * nY * nX)(_.toDouble)
    Hdf5Netcdf.write(s"$dir/big.nc", t4, leads, yc, xc, vals, vals.map(_ / 10))
    val dataBytes = 2L * vals.length * 8
    val before = Hdf5Netcdf.bytesRead.get()
    val s = readDf(s"$dir/big.nc").agg(sum("sic_mean")).head().getDouble(0)
    assert(s == vals.sum)
    val delta = Hdf5Netcdf.bytesRead.get() - before
    // per slice: superblock + group walk + headers (sub-KB each) + axes +
    // ONE variable's slab; stddev slabs must never be fetched
    val metaOverhead = 4 * 4096L
    assert(delta < dataBytes / 2 + metaOverhead,
      s"read $delta bytes; one-variable share is ${dataBytes / 2}")
  }

  test("unknown dialects fail loudly with the feature named") {
    val dir = tmpDir("h5rej")
    val p = s"$dir/v1.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // superblock version byte (offset 8): 1 (1.6-era indexed variant) and
    // 9 (unknown) both name the version; 2/3 now DECODE (tests below)
    for (v <- Seq(1, 9)) {
      val sbx = bytes.clone(); sbx(8) = v.toByte
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sb$v.nc"), sbx)
      val e = intercept[Exception] { readDf(s"$dir/sb$v.nc").collect() }
      assert(Option(e.getMessage).exists(_.contains("superblock version")),
        s"got: ${e.getMessage}")
    }
    // root object header first byte (offset 96) -> 7: neither a v1 header
    // nor an OHDR signature; also clear the superblock entry's cache type
    // (offset 72) so the walk consults the root header, not the scratch
    val oh2 = bytes.clone(); oh2(96) = 7; oh2(72) = 0
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/oh2.nc"), oh2)
    val e2 = intercept[Exception] { readDf(s"$dir/oh2.nc").collect() }
    assert(Option(e2.getMessage).exists(_.contains("neither v1 nor OHDR")),
      s"got: ${e2.getMessage}")
  }

  // ------------------------------------ "latest format" (superblock v3)

  test("lookup3 matches the published lookup3.c test vectors") {
    // pinned from Bob Jenkins' lookup3.c self-test — the checksum every
    // latest-format structure carries
    assert(Hdf5Netcdf.lookup3(Array.empty[Byte], 0, 0) == 0xdeadbeefL)
    val four = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Hdf5Netcdf.lookup3(four, 0, four.length) == 0x17770551L)
  }

  test("latest-format contiguous file decodes identically to the default") {
    val dir = tmpDir("h5latest")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
    assert(readDf(s"$dir/b.nc").rdd.getNumPartitions == nT)
  }

  test("latest-format fixed-array chunks + shuffle+deflate round-trip") {
    val dir = tmpDir("h5lfa")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      floatData = false, chunkX = Some(2), filters = Seq(2, 1),
      latestFormat = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("latest-format unfiltered fixed-array chunks round-trip") {
    val dir = tmpDir("h5lfau")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), latestFormat = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("latest-format v2 B-tree chunk index round-trips " +
    "(filtered type-11 and unfiltered type-10 records)") {
    val dir = tmpDir("h5bt2")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), filters = Seq(2, 1), latestFormat = true,
      btreeV2Index = true)
    Hdf5Netcdf.write(s"$dir/c.nc", times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), latestFormat = true, btreeV2Index = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val c = readDf(s"$dir/c.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq == c.toSeq)
  }

  test("latest-format depth-1 v2 B-tree chunk index (BTIN root, 2-byte " +
    "leaf-record counts) round-trips against the default dialect") {
    // 67 time steps x 4 x-chunks = 268 chunk records; node size 10560 ->
    // maxLeafRec = (10560-10)/40 = 263 < 268 forces a depth-1 tree, and
    // 263 needs a TWO-byte child-pointer count field — both previously
    // uncovered reader paths (r9 ADVICE)
    val dir = tmpDir("h5bt2d1")
    val t67 = Array.tabulate(67)(i => times(0) + i * 86400000000L)
    val y1 = Array(100.0); val x8 = Array.tabulate(8)(i => 200.0 + 25.0 * i)
    val m67 = Array.tabulate(67 * nL * 1 * 8)(i => 0.001 * i)
    Hdf5Netcdf.write(s"$dir/a.nc", t67, leads, y1, x8, m67, m67.map(_ / 10))
    Hdf5Netcdf.write(s"$dir/b.nc", t67, leads, y1, x8, m67, m67.map(_ / 10),
      chunkX = Some(2), latestFormat = true, btreeV2Index = true,
      bt2NodeSize = 10560)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.length == 67 * nL * 8)
    assert(a.toSeq == b.toSeq)
  }

  test("dense (fractal-heap) link storage, root DIRECT block + depth-0 " +
    "name index: decodes identically to the compact-link twin") {
    val dir = tmpDir("h5dense")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true, denseLinks = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("dense link storage, root INDIRECT block (FHIB, multi-block heap) " +
    "+ depth-1 type-5 name B-tree (BTIN): decodes identically") {
    // 6 real links + 40 pad aliases = 46 links: the packed bodies
    // overflow one 512-byte direct block (-> FHIB root over row-0
    // blocks) and 46 records overflow one 45-record 512-byte leaf
    // (-> BTIN root) — the many-variable real-file shape
    val dir = tmpDir("h5denseib")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true, denseLinks = true, denseLinkPad = 40)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("dense link storage, INDIRECT CHILD heap blocks (FHIB within " +
    "FHIB): decodes identically to the compact-link twin") {
    // shrunken doubling table (width 2, start 512, max direct 1024):
    // 6 real links + 230 pads overflow the root's three direct rows
    // (4 KiB), so the tail links live behind a row-3 indirect CHILD —
    // the very-wide-group shape the r10 reader rejected by name
    val dir = tmpDir("h5denseic")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      latestFormat = true, denseLinks = true, denseLinkPad = 230,
      denseIndirectChild = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // structural witness: the fixture file really contains two FHIBs
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/b.nc"))
    val first = bytes.indexOfSlice("FHIB".getBytes)
    assert(first >= 0 &&
      bytes.indexOfSlice("FHIB".getBytes, first + 4) > first,
      "indirect-child fixture must carry a child FHIB and a root FHIB")
  }

  test("dense link storage: corrupt FHDB block checksum fails loudly") {
    val dir = tmpDir("h5densebad")
    val p = s"$dir/a.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      latestFormat = true, denseLinks = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // flip one byte inside the (only) FHDB block's object area
    val at = bytes.indexOfSlice("FHDB".getBytes) + 30
    bytes(at) = (bytes(at) ^ 0x7f).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val e = intercept[Exception](readDf(p).collect())
    assert(e.getMessage.contains("FHDB") ||
      e.getCause != null && e.getCause.getMessage.contains("FHDB"),
      s"got: ${e.getMessage}")
  }

  test("latest-format single-chunk index (chunk == dataset) round-trips") {
    val dir = tmpDir("h5lsc")
    val t1 = Array(times(0))
    val m1 = slab(0); val s1 = m1.map(_ / 10)
    Hdf5Netcdf.write(s"$dir/a.nc", t1, leads, yc, xc, m1, s1)
    // nt=1 + chunkX=nx -> one chunk covering the dataset; filtered variant
    Hdf5Netcdf.write(s"$dir/b.nc", t1, leads, yc, xc, m1, s1,
      chunkX = Some(nX), filters = Seq(2, 1), latestFormat = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("latest-format f32 + _FillValue ride the v3-attribute path") {
    val m2 = Array.tabulate(mean.length)(i =>
      if (i % 5 == 0) Double.NaN else (i % 32) / 32.0)
    val p = tmpDir("h5lfv") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, m2, m2.map(_ / 2),
      floatData = true, fillValue = Some(-999.0), chunkX = Some(2),
      filters = Seq(2, 1), latestFormat = true)
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() == m2.count(_.isNaN))
    assert(df.filter(col("sic_mean") === -999.0).count() == 0)
  }

  test("latest-format checksums verify: corrupt OHDR and superblock fail") {
    val dir = tmpDir("h5lsum")
    val p = s"$dir/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      latestFormat = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // root OHDR begins at 48 (after the superblock): flip a message byte
    val ohBad = bytes.clone(); ohBad(60) = (ohBad(60) ^ 0x5A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/oh.nc"), ohBad)
    val e1 = intercept[Exception] { readDf(s"$dir/oh.nc").collect() }
    assert(Option(e1.getMessage).exists(m =>
      m.contains("OHDR") && m.contains("checksum")), s"got: ${e1.getMessage}")
    // superblock: flip the EOF field
    val sbBad = bytes.clone(); sbBad(30) = (sbBad(30) ^ 0x5A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sb.nc"), sbBad)
    val e2 = intercept[Exception] { readDf(s"$dir/sb.nc").collect() }
    assert(Option(e2.getMessage).exists(m =>
      m.contains("superblock") && m.contains("checksum")),
      s"got: ${e2.getMessage}")
  }

  test("latest-format chunked reads stay O(slice)") {
    val dir = tmpDir("h5lseek")
    val t4 = Array.tabulate(4)(i => us(f"2022-01-0${i + 1} 00:00:00"))
    val vals = Array.tabulate(4 * nL * nY * nX)(_.toDouble)
    Hdf5Netcdf.write(s"$dir/big.nc", t4, leads, yc, xc, vals, vals.map(_ / 10),
      chunkX = Some(2), filters = Seq(2, 1), latestFormat = true)
    val rawDataBytes = 2L * vals.length * 8
    val before = Hdf5Netcdf.bytesRead.get()
    val s = readDf(s"$dir/big.nc").agg(sum("sic_mean")).head().getDouble(0)
    assert(s == vals.sum)
    val delta = Hdf5Netcdf.bytesRead.get() - before
    val metaOverhead = 4 * 4096L
    assert(delta < rawDataBytes / 2 + metaOverhead,
      s"read $delta bytes; one variable's raw share is ${rawDataBytes / 2}")
  }

  test("latest-format extensible-array index: inline-only elements " +
    "(few chunks) round-trip") {
    // 2 times x ceil(3/2) chunks = 4 chunks: all live inline in the EAIB,
    // no data blocks at all — the smallest appendable-time file
    val dir = tmpDir("h5ea0")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), latestFormat = true, unlimitedTime = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("latest-format extensible-array index: data-block elements + " +
    "shuffle+deflate round-trip") {
    // 4 times x 3 chunks = 12 chunks: 4 inline + 8 in the first EADB —
    // both the inline and the directly-addressed paths exercised, filtered
    val dir = tmpDir("h5ea1")
    val t4 = Array.tabulate(4)(i => us(f"2022-02-0${i + 1} 00:00:00"))
    val vals = Array.tabulate(4 * nL * nY * nX)(i =>
      if (i % 9 == 0) Double.NaN else (i % 41) / 41.0)
    Hdf5Netcdf.write(s"$dir/a.nc", t4, leads, yc, xc, vals, vals.map(_ / 3))
    Hdf5Netcdf.write(s"$dir/b.nc", t4, leads, yc, xc, vals, vals.map(_ / 3),
      floatData = true, fillValue = Some(-999.0), chunkX = Some(1),
      filters = Seq(2, 1), latestFormat = true, unlimitedTime = true)
    val a = readDf(s"$dir/a.nc")
    val b = readDf(s"$dir/b.nc")
    assert(b.count() == 4 * nL * nY * nX)
    assert(b.filter(col("sic_mean").isNull).count() == vals.count(_.isNaN))
    // f32 parity against the f64 twin at float precision
    val av = a.orderBy("time", "leadtime", "yc", "xc")
      .select("sic_mean").collect().map(r =>
        if (r.isNullAt(0)) Float.NaN else r.getDouble(0).toFloat)
    val bv = b.orderBy("time", "leadtime", "yc", "xc")
      .select("sic_mean").collect().map(r =>
        if (r.isNullAt(0)) Float.NaN else r.getDouble(0).toFloat)
    assert(av.length == bv.length)
    assert(av.zip(bv).forall { case (x, y) =>
      (x.isNaN && y.isNaN) || x == y })
  }

  test("latest-format extensible-array reads stay O(slice)") {
    val dir = tmpDir("h5eaSeek")
    val t4 = Array.tabulate(4)(i => us(f"2022-03-0${i + 1} 00:00:00"))
    val vals = Array.tabulate(4 * nL * nY * nX)(_.toDouble)
    Hdf5Netcdf.write(s"$dir/big.nc", t4, leads, yc, xc, vals, vals.map(_ / 10),
      chunkX = Some(1), filters = Seq(2, 1), latestFormat = true,
      unlimitedTime = true)
    val rawDataBytes = 2L * vals.length * 8
    val before = Hdf5Netcdf.bytesRead.get()
    val s = readDf(s"$dir/big.nc").agg(sum("sic_mean")).head().getDouble(0)
    assert(s == vals.sum)
    val delta = Hdf5Netcdf.bytesRead.get() - before
    val metaOverhead = 4 * 4096L
    assert(delta < rawDataBytes / 2 + metaOverhead,
      s"read $delta bytes; one variable's raw share is ${rawDataBytes / 2}")
  }

  test("extensible-array structures verify their checksums loudly") {
    val dir = tmpDir("h5eaSum")
    val p = s"$dir/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), latestFormat = true, unlimitedTime = true)
    assert(readDf(p).count() == nT * nL * nY * nX) // clean file reads
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // find the EAIB and corrupt one element byte inside it
    val at = (0 until bytes.length - 4).find(i =>
      bytes(i) == 'E' && bytes(i + 1) == 'A' && bytes(i + 2) == 'I' &&
        bytes(i + 3) == 'B').get
    val bad = bytes.clone(); bad(at + 20) = (bad(at + 20) ^ 0x5A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.nc"), bad)
    val e = intercept[Exception] { readDf(s"$dir/bad.nc").collect() }
    assert(Option(e.getMessage).exists(m =>
      m.contains("EAIB") && m.contains("checksum")), s"got: ${e.getMessage}")
  }

  test("latest-format implicit chunk index round-trips (f64 and f32)") {
    val dir = tmpDir("h5impl")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), latestFormat = true, implicitIndex = true)
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
    // f32 twin: arithmetic chunk addressing at element size 4
    val m2 = Array.tabulate(mean.length)(i => (i % 16) / 16.0)
    Hdf5Netcdf.write(s"$dir/c.nc", times, leads, yc, xc, m2, m2.map(_ / 2),
      floatData = true, chunkX = Some(1), latestFormat = true,
      implicitIndex = true)
    val c = readDf(s"$dir/c.nc")
    assert(c.count() == nT * nL * nY * nX)
    val r = c.filter(col("leadtime") === 2 && col("yc") === 125.0 &&
      col("xc") === 250.0 &&
      col("time") === Timestamp.valueOf("2020-06-08 00:00:00")).head()
    assert(r.getAs[Double]("sic_mean") == (mean.length - 1) % 16 / 16.0)
  }

  test("OCHK continuation blocks: attributes decode across header chunks") {
    // attributes (units, _FillValue, DIMENSION_LIST) ride a continuation
    // block; fill masking + dim-identity certification must still work,
    // proving the OCHK walk + checksum path end to end
    val dir = tmpDir("h5ochk")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev,
      fillValue = Some(-999.0), latestFormat = true, splitHeaders = true,
      dimList = Some(Seq("time", "leadtime", "yc", "xc")))
    val df = readDf(s"$dir/a.nc")
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL) // fill seen
    // a corrupted continuation block fails loudly naming OCHK
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a.nc"))
    val at = (0 until bytes.length - 4).find(i =>
      bytes(i) == 'O' && bytes(i + 1) == 'C' && bytes(i + 2) == 'H' &&
        bytes(i + 3) == 'K').get
    val bad = bytes.clone(); bad(at + 6) = (bad(at + 6) ^ 0x5A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.nc"), bad)
    val e = intercept[Exception] { readDf(s"$dir/bad.nc").collect() }
    assert(Option(e.getMessage).exists(m =>
      m.contains("OCHK") && m.contains("checksum")), s"got: ${e.getMessage}")
  }

  test("superblock v2 (same layout as v3) decodes") {
    val dir = tmpDir("h5sb2")
    val p = s"$dir/v3.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      latestFormat = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val v2 = bytes.clone()
    v2(8) = 2 // version byte; recompute the superblock checksum over [0,44)
    val sum = Hdf5Netcdf.lookup3(v2, 0, 44)
    v2(44) = sum.toByte; v2(45) = (sum >>> 8).toByte
    v2(46) = (sum >>> 16).toByte; v2(47) = (sum >>> 24).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/v2.nc"), v2)
    val a = readDf(p).orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/v2.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("DIMENSION_LIST references resolve and certify axis identity") {
    val p = tmpDir("h5dim") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      latestFormat = true,
      dimList = Some(Seq("time", "leadtime", "yc", "xc")))
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL)
  }

  test("a transposed DIMENSION_LIST with coinciding axis lengths fails loudly") {
    // nL == nY == 2 here, so the SHAPE check alone cannot see that the
    // leadtime and yc axes are swapped — the resolved dimension-scale
    // references can, and must refuse to misread the tensor
    val p = tmpDir("h5dimT") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      latestFormat = true,
      dimList = Some(Seq("time", "yc", "leadtime", "xc")))
    val e = intercept[Exception] { readDf(p).collect() }
    assert(Option(e.getMessage).exists(m =>
      m.contains("DIMENSION_LIST") && m.contains("transposed")),
      s"got: ${e.getMessage}")
  }

  test("default and latest dialects union through one directory scan") {
    val dir = tmpDir("h5ldir")
    Hdf5Netcdf.write(s"$dir/a.nc", Array(times(0)), leads, yc, xc,
      slab(0), slab(0).map(_ / 10))
    Hdf5Netcdf.write(s"$dir/b.nc", Array(times(1)), leads, yc, xc,
      slab(1), slab(1).map(_ / 10), latestFormat = true)
    val df = readDf(dir)
    assert(df.select("time").distinct().count() == 2)
    assert(df.count() == 2L * nL * nY * nX)
  }

  test("reference-class bookkeeping attrs (DIMENSION_LIST-style) are skipped") {
    // real netCDF-4 files attach vlen/reference attributes for dimension
    // scales; the reader matches variables by name and must decode THROUGH
    // them, not choke on the unsupported value type
    val p = tmpDir("h5ref") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      fillValue = Some(-999.0), bookkeepingAttrs = true)
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL)
  }

  // -------------------------------------------------- chunked + filters

  test("chunked layout with a partial edge chunk decodes identically") {
    // cx=2 over nx=3 -> two chunks per (time) row, the second partial
    // (stored full-size zero-padded per spec); B-tree walked, not guessed
    val dir = tmpDir("h5chunk")
    Hdf5Netcdf.write(s"$dir/a.nc", times, leads, yc, xc, mean, stddev)
    Hdf5Netcdf.write(s"$dir/b.nc", times, leads, yc, xc, mean, stddev,
      chunkX = Some(2))
    val a = readDf(s"$dir/a.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    val b = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("shuffle+deflate (netCDF4's default compression) round-trips") {
    val p = tmpDir("h5defl") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      floatData = true, fillValue = Some(-999.0),
      chunkX = Some(2), filters = Seq(2, 1))
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL) // NaN cells
    val r = df.filter(col("leadtime") === 2 && col("yc") === 100.0 &&
      col("xc") === 225.0 &&
      col("time") === Timestamp.valueOf("2020-06-08 00:00:00")).head()
    assert(math.abs(r.getAs[Double]("sic_mean") -
      (0.2 + 0.01 + 0.0 + 0.0001).toFloat) < 1e-9)
  }

  test("fletcher32 checksums verify on read; a corrupted chunk fails loudly") {
    val dir = tmpDir("h5fl")
    val p = s"$dir/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      chunkX = Some(2), filters = Seq(2, 1, 3))
    assert(readDf(p).count() == nT * nL * nY * nX) // checksums pass
    // locate the first raw-data chunk via its B-tree (node type 1) and
    // flip one payload byte — the reader must refuse, not misread
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val treeAt = (0 until bytes.length - 8).find(i =>
      bytes(i) == 'T' && bytes(i + 1) == 'R' && bytes(i + 2) == 'E' &&
        bytes(i + 3) == 'E' && bytes(i + 4) == 1).get
    val chunkAddr = bb.getLong(treeAt + 24 + 48) // past head + first key
    val corrupted = bytes.clone()
    corrupted(chunkAddr.toInt + 3) = (corrupted(chunkAddr.toInt + 3) ^ 0x5A).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.nc"), corrupted)
    val e = intercept[Exception] { readDf(s"$dir/bad.nc").collect() }
    assert(Option(e.getMessage).exists(_.contains("fletcher32")),
      s"got: ${e.getMessage}")
  }

  test("unsupported filter ids are rejected loudly, naming the id") {
    val p = tmpDir("h5szip") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev,
      filters = Seq(4)) // szip: listed in the pipeline, never applied
    val e = intercept[Exception] { readDf(p).collect() }
    assert(Option(e.getMessage).exists(m =>
      m.contains("filter id 4") && m.contains("external codec")),
      s"got: ${e.getMessage}")
  }

  test("chunked reads stay O(slice): untouched variables' chunks unread") {
    val dir = tmpDir("h5chunkseek")
    val t4 = Array.tabulate(4)(i => us(f"2022-01-0${i + 1} 00:00:00"))
    val vals = Array.tabulate(4 * nL * nY * nX)(_.toDouble)
    Hdf5Netcdf.write(s"$dir/big.nc", t4, leads, yc, xc, vals, vals.map(_ / 10),
      chunkX = Some(2), filters = Seq(2, 1))
    val rawDataBytes = 2L * vals.length * 8
    val before = Hdf5Netcdf.bytesRead.get()
    val s = readDf(s"$dir/big.nc").agg(sum("sic_mean")).head().getDouble(0)
    assert(s == vals.sum)
    val delta = Hdf5Netcdf.bytesRead.get() - before
    // deflated mean chunks + its B-tree + metadata; stddev chunks never
    val metaOverhead = 4 * 4096L
    assert(delta < rawDataBytes / 2 + metaOverhead,
      s"read $delta bytes; one variable's raw share is ${rawDataBytes / 2}")
  }

  test("CF time units ride the same conversion as the classic codec") {
    val p = tmpDir("h5units") + "/fc.nc"
    Hdf5Netcdf.write(p, times, leads, yc, xc, mean, stddev)
    val df = readDf(p).select("time").distinct()
    assert(df.collect().map(_.getTimestamp(0)).toSet ==
      Set(Timestamp.valueOf("2020-06-01 00:00:00"),
        Timestamp.valueOf("2020-06-08 00:00:00")))
  }
}
