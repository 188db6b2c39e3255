package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode is a REAL image decode of a real public format: binary
  * netpbm (PPM `P6` color / PGM `P5` grayscale — header parse +
  * raster, the format published in netpbm's ppm(5)/pgm(5) man pages),
  * implemented pure-JVM in [[decodeNetpbm]]. The container has no
  * image FILES, so the payloads are fixture-ENCODED ([[encodePpm]]):
  * each document's text bytes become the raster of a width-4 P6
  * image. Encode is the fixture; decode is the product. The Spark
  * shape is what a production decode has:
  *  - payloads travel as `BinaryType` columns (never strings),
  *  - decode runs via typed `Dataset.mapPartitions` (Encoder-backed,
  *    stays in SQL land — no `.rdd` round-trip) — one codec init per
  *    PARTITION, not per row (the thing that matters when the real
  *    decoder is libjpeg/ffmpeg),
  *  - output is a typed struct column; downstream stays columnar.
  *
  * The oracle recomputes the PPM geometry (header size, height =
  * text_len/12) and the raster mean from the same text in DuckDB — so
  * encode → binary → REAL header+raster parse → features is verified
  * end-to-end, not just "rows > 0".
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Parallelism decoupling for the per-row decode kernels (the
    * DedupOps.docShingles idiom; guide §2.5 "input skew" / §6
    * unsplittable input): a single-row-group parquet file arrives as
    * ONE split, so without this the whole encode+decode pipeline of a
    * query runs on one core (measured: q251's entire 6.2s wall was a
    * single 1-task stage). The shuffle moves only (doc_id, payload) —
    * a few hundred KB here — and at production scale, where the scan
    * already has at least a split per core, the branch never fires,
    * keeping the decode pipelines shuffle-free exactly where it
    * matters. */
  private[graft] def spread(docs: DataFrame): DataFrame =
    graft.Util.spreadInput(docs)

  /** Typed decode outputs: the Encoder keeps mapPartitions inside SQL
    * land (UnsafeRow in/out, AQE + codegen above and below) — no RDD
    * round-trip, no InternalRow -> Row -> InternalRow per row. */
  final case class Decoded(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, channels: Int, mean_byte: Double)
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
      mean_byte: Double)
  final case class Resized(doc_id: Long, orig_bytes: Int,
      resized: Array[Byte], resized_bytes: Int, resized_mean: Double)

  /** Fixture encoder (the container ships no image files): pack a
    * byte payload into a syntactically-valid binary PPM (`P6`): width
    * fixed at 4 px, height = len/12 full 12-byte rows (4 px × RGB),
    * maxval 255, raster = the first height×12 payload bytes. Tail
    * bytes that don't fill a row are dropped — exactly what the
    * oracle's `len // 12` recomputes. */
  private[graft] def encodePpm(bytes: Array[Byte]): Array[Byte] = {
    val h = bytes.length / 12
    val header = s"P6\n4 $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + h * 12)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(bytes, 0, out, header.length, h * 12)
    out
  }

  /** REAL netpbm decode — the pure-JVM header+raster parser for binary
    * PPM (`P6`, RGB) and PGM (`P5`, gray) per the published netpbm
    * format: magic, then whitespace-separated width/height/maxval with
    * `#` comments allowed, ONE whitespace byte, then the raster
    * (width×height×channels bytes at maxval < 256). Malformed payloads
    * throw — a decode that silently fabricates pixels would poison
    * every feature downstream. */
  private[graft] def decodeNetpbm(docId: Long, bytes: Array[Byte])
      : Decoded = {
    var pos = 0
    def fail(why: String) =
      throw new IllegalArgumentException(s"netpbm decode [$docId]: $why")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      if (pos == start) fail("truncated header")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    val magic = token()
    val channels = magic match {
      case "P6" => 3
      case "P5" => 1
      case m    => fail(s"unsupported magic '$m'")
    }
    val width = token().toInt
    val height = token().toInt
    val maxval = token().toInt
    if (width < 0 || height < 0) fail(s"bad dims ${width}x$height")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    pos += 1 // exactly ONE whitespace byte separates maxval and raster
    val need = width * height * channels
    if (pos + need > bytes.length)
      fail(s"raster truncated: need $need, have ${bytes.length - pos}")
    var sum = 0L
    var i = pos
    val end = pos + need
    while (i < end) { sum += bytes(i) & 0xff; i += 1 }
    Decoded(docId, bytes.length, width, height, channels,
      if (need == 0) 0.0 else sum.toDouble / need)
  }

  final case class BmpDecoded(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, mean_pixel: Double, top_left_blue: Int)

  /** BMP fixture encoder: pack the payload into a syntactically-valid
    * uncompressed 24-bit BMP (BITMAPINFOHEADER), width fixed at 3 px so
    * every 9-byte pixel row carries 3 PAD bytes to the 4-byte stride —
    * the format detail a naive "average the raster" decoder gets
    * wrong. Image row i (top-first) takes payload bytes [9i, 9i+9);
    * rows are stored BOTTOM-UP (positive height) per the spec, so the
    * top-left pixel lives in the LAST stored row — the second detail a
    * lazy decoder misses. Tail payload bytes that don't fill a row are
    * dropped (len/9 full rows), exactly what the oracle recomputes. */
  private[graft] def encodeBmp(bytes: Array[Byte]): Array[Byte] = {
    val h = bytes.length / 9
    val stride = 12 // 3 px × 3 B = 9, padded to the 4-byte boundary
    val out = java.nio.ByteBuffer.allocate(54 + h * stride)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
      .putInt(54 + h * stride).putShort(0).putShort(0).putInt(54)
      .putInt(40).putInt(3).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(h * stride)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var stored = h - 1 // bottom-up: image row h-1 is stored first
    while (stored >= 0) {
      out.put(bytes, 9 * stored, 9).put(0.toByte).put(0.toByte)
        .put(0.toByte)
      stored -= 1
    }
    out.array()
  }

  /** REAL BMP decode — pure-JVM parser for uncompressed 24-bit BMPs
    * per the published format: 14-byte file header ('BM', size, pixel
    * offset), BITMAPINFOHEADER (size ≥ 40; planes 1, bpp 24,
    * BI_RGB only), rows padded to 4-byte strides, stored bottom-up
    * when height is positive / top-down when negative (both handled).
    * Features: the raster mean over PIXEL bytes only (pad bytes
    * excluded — including them skews every image whose row length
    * isn't a multiple of 4), and the blue channel of the TOP-LEFT
    * pixel (pixels are BGR), which forces the decoder to honor the
    * bottom-up row order. Malformed payloads throw. */
  private[graft] def decodeBmp(docId: Long, bytes: Array[Byte])
      : BmpDecoded = {
    def fail(why: String) =
      throw new IllegalArgumentException(s"bmp decode [$docId]: $why")
    if (bytes.length < 54) fail(s"truncated header: ${bytes.length} B")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.get() != 'B' || bb.get() != 'M') fail("bad magic")
    bb.getInt(); bb.getShort(); bb.getShort() // file size, reserved
    val pixelOffset = bb.getInt()
    val infoSize = bb.getInt()
    if (infoSize < 40) fail(s"unsupported info header size $infoSize")
    val width = bb.getInt()
    val rawHeight = bb.getInt()
    val planes = bb.getShort()
    val bpp = bb.getShort()
    val compression = bb.getInt()
    if (width < 0) fail(s"bad width $width")
    if (planes != 1) fail(s"bad planes $planes")
    if (bpp != 24) fail(s"unsupported bpp $bpp (24-bit only)")
    if (compression != 0) fail(s"compressed BMP unsupported")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val rowBytes = width * 3
    val stride = (rowBytes + 3) & ~3
    if (pixelOffset < 54 || pixelOffset > bytes.length)
      fail(s"bad pixel offset $pixelOffset")
    if (pixelOffset + height.toLong * stride > bytes.length)
      fail(s"raster truncated: need ${height.toLong * stride}, " +
        s"have ${bytes.length - pixelOffset}")
    var sum = 0L
    var r = 0
    while (r < height) { // pixel bytes only — pad bytes excluded
      var i = pixelOffset + r * stride
      val end = i + rowBytes
      while (i < end) { sum += bytes(i) & 0xff; i += 1 }
      r += 1
    }
    val nPix = height.toLong * rowBytes
    val topRow = if (topDown) 0 else height - 1
    val topLeftBlue =
      if (height == 0 || width == 0) 0
      else bytes(pixelOffset + topRow * stride) & 0xff
    BmpDecoded(docId, bytes.length, width, height,
      if (nPix == 0) 0.0 else sum.toDouble / nPix, topLeftBlue)
  }

  /** q183's pipeline: the BMP twin of [[decodeImages]] — same typed
    * mapPartitions shape, second container format. */
  def decodeImagesBmp(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeBmp(id, encodeBmp(b)) })
      .toDF()
  }

  final case class TiffDecoded(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, n_strips: Int, n_pixels: Long, mean_gray: Double,
      top_left_gray: Int, pos_sum: Long)

  /** TIFF fixture encoder — baseline TIFF 6.0, little-endian ("II"),
    * 8-bit grayscale, UNCOMPRESSED, and — the detail that makes TIFF
    * TIFF — the raster split into MULTIPLE STRIPS (RowsPerStrip 2)
    * whose StripOffsets/StripByteCounts arrays live OUTSIDE the IFD
    * whenever count×size exceeds the 4-byte inline field, per the
    * spec's value-or-offset rule. Width fixed at 5, h = len/5 full
    * rows (tail bytes dropped); image row i takes payload bytes
    * [5i, 5i+5). The 9 IFD entries are written in ascending tag
    * order, which the decoder ENFORCES (the spec requires it; real
    * readers rely on it for binary search). h ≤ 2 keeps both arrays
    * inline — so the fixture population exercises BOTH placements. */
  private[graft] def encodeTiff(bytes: Array[Byte]): Array[Byte] = {
    val w = 5
    val h = bytes.length / w
    val ns = math.max(1, (h + 1) / 2) // stored strip entries (≥ 1)
    val external = ns > 1             // LONG arrays: 4·ns > 4 bytes
    val rasterOff = 8
    val arraysOff = rasterOff + w * h
    val ifdOff = arraysOff + (if (external) 8 * ns else 0)
    val out = java.nio.ByteBuffer.allocate(ifdOff + 2 + 9 * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    out.put(bytes, 0, w * h)
    // strip k covers rows [2k, min(2k+2, h)) — contiguous in the file
    val offs = Array.tabulate(ns)(k => rasterOff + 2 * k * w)
    val cnts = Array.tabulate(ns)(k =>
      math.max(0, (math.min(2 * k + 2, h) - 2 * k) * w))
    if (external) { offs.foreach(out.putInt); cnts.foreach(out.putInt) }
    out.putShort(9)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3) { out.putShort(v.toShort); out.putShort(0) }
      else out.putInt(v)
    }
    entry(256, 3, 1, w)  // ImageWidth, SHORT
    entry(257, 4, 1, h)  // ImageLength, LONG
    entry(258, 3, 1, 8)  // BitsPerSample
    entry(259, 3, 1, 1)  // Compression = none
    entry(262, 3, 1, 1)  // Photometric = BlackIsZero
    entry(273, 4, ns, if (external) arraysOff else offs(0))
    entry(277, 3, 1, 1)  // SamplesPerPixel
    entry(278, 3, 1, 2)  // RowsPerStrip
    entry(279, 4, ns, if (external) arraysOff + 4 * ns else cnts(0))
    out.putInt(0) // next-IFD terminator
    out.array()
  }

  /** REAL TIFF decode — pure-JVM parser for baseline TIFF 6.0
    * (uncompressed, 8-bit gray, strip-organized) per the published
    * spec: byte-order mark ("II" little / "MM" big — both handled),
    * magic 42, IFD walk with the ascending-tag-order invariant
    * enforced, SHORT/LONG field decoding through the value-or-offset
    * rule (count×size ≤ 4 → inline, else file offset — THE classic
    * TIFF reader bug), then the strip walk in declared order with
    * per-strip bounds checks. Features: geometry, strip count, raster
    * mean, top-left pixel, and the 1-based position-weighted checksum
    * that a decoder walking strips out of order (or re-reading one)
    * cannot reproduce. Malformed payloads throw. */
  private[graft] def decodeTiff(docId: Long, bytes: Array[Byte])
      : TiffDecoded = {
    def fail(why: String) =
      throw new IllegalArgumentException(s"tiff decode [$docId]: $why")
    if (bytes.length < 8) fail(s"truncated header: ${bytes.length} B")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order((bytes(0).toChar, bytes(1).toChar) match {
      case ('I', 'I') => java.nio.ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => java.nio.ByteOrder.BIG_ENDIAN
      case _          => fail("bad byte-order mark")
    })
    if (bb.getShort(2) != 42) fail("bad magic (not 42)")
    val ifdOff = bb.getInt(4)
    if (ifdOff < 8 || ifdOff + 2 > bytes.length)
      fail(s"bad IFD offset $ifdOff")
    val n = bb.getShort(ifdOff) & 0xffff
    if (ifdOff + 2 + 12 * n + 4 > bytes.length) fail("IFD truncated")
    var tags = Map.empty[Int, (Int, Int, Int)] // tag → (type, count, pos)
    var prev = -1
    var i = 0
    while (i < n) {
      val e = ifdOff + 2 + 12 * i
      val tag = bb.getShort(e) & 0xffff
      if (tag <= prev) fail(s"IFD tags not ascending at $tag")
      prev = tag
      tags += tag ->
        ((bb.getShort(e + 2) & 0xffff, bb.getInt(e + 4), e + 8))
      i += 1
    }
    def value(typ: Int, pos: Int): Long = typ match {
      case 3 => (bb.getShort(pos) & 0xffff).toLong
      case 4 => bb.getInt(pos).toLong & 0xffffffffL
      case t => fail(s"unsupported field type $t")
    }
    def scalar(tag: Int): Long = tags.get(tag) match {
      case Some((typ, cnt, pos)) =>
        if (cnt != 1) fail(s"tag $tag: expected count 1, got $cnt")
        value(typ, pos)
      case None => fail(s"missing tag $tag")
    }
    def scalarOr(tag: Int, dflt: Long): Long =
      if (tags.contains(tag)) scalar(tag) else dflt
    def array(tag: Int): Array[Long] = tags.get(tag) match {
      case Some((typ, cnt, pos)) =>
        val sz = typ match {
          case 3 => 2
          case 4 => 4
          case t => fail(s"unsupported field type $t")
        }
        val base =
          if (cnt.toLong * sz <= 4) pos
          else { // the value-or-offset rule: field holds a file offset
            val off = bb.getInt(pos)
            if (off < 8 || off.toLong + cnt.toLong * sz > bytes.length)
              fail(s"tag $tag: array out of bounds")
            off
          }
        Array.tabulate(cnt)(k => value(typ, base + k * sz))
      case None => fail(s"missing tag $tag")
    }
    val width = scalar(256).toInt
    val height = scalar(257).toInt
    if (width <= 0 || height < 0) fail(s"bad dims ${width}x$height")
    if (scalar(259) != 1) fail("compressed TIFF unsupported")
    if (scalar(258) != 8) fail("only 8-bit samples supported")
    if (scalarOr(277, 1) != 1) fail("only 1 sample/pixel supported")
    if (scalar(262) > 1) fail("unsupported photometric interpretation")
    val offs = array(273)
    val cnts = array(279)
    if (offs.length != cnts.length)
      fail(s"strip offsets(${offs.length}) != counts(${cnts.length})")
    val nPix = width.toLong * height
    var sum = 0L
    var posSum = 0L
    var idx = 1L
    var topLeft = 0
    var strips = 0
    var k = 0
    while (k < offs.length) {
      val off = offs(k).toInt
      val cnt = cnts(k).toInt
      if (cnt > 0) {
        if (off < 8 || off.toLong + cnt > bytes.length)
          fail(s"strip $k out of bounds: [$off, ${off + cnt})")
        if (strips == 0) topLeft = bytes(off) & 0xff
        var p = off
        val end = off + cnt
        while (p < end) {
          val v = bytes(p) & 0xff
          sum += v; posSum += idx * v; idx += 1; p += 1
        }
        strips += 1
      }
      k += 1
    }
    if (idx - 1 != nPix)
      fail(s"strip bytes ${idx - 1} != declared pixels $nPix")
    TiffDecoded(docId, bytes.length, width, height, strips, nPix,
      if (nPix == 0) 0.0 else sum.toDouble / nPix, topLeft, posSum)
  }

  /** q262's pipeline: the TIFF twin of [[decodeImagesBmp]] — same
    * typed mapPartitions shape, strip-organized container. */
  def decodeImagesTiff(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodeTiff(id, encodeTiff(b)) })
      .toDF()
  }

  final case class GifDecoded(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_index: Double, top_left_index: Int,
      pos_sum: Long)

  /** GIF87a fixture encoder — the third image container, and the
    * first with REAL compression in the round-trip: pixels are
    * LZW-compressed per the published GIF spec (variable code width
    * 9→12 bits LSB-first, CLEAR/EOI codes, dictionary reset at 4096,
    * 255-byte sub-blocks). The 256-entry grayscale global color table
    * makes pixel index i ≡ payload byte i, so every decoded statistic
    * is payload-derivable while the bytes on the wire are genuinely
    * compressed. Width fixed at 4; tail bytes that don't fill a row
    * are dropped (len/4 full rows), as the oracle recomputes. */
  private[graft] def encodeGif(bytes: Array[Byte]): Array[Byte] =
    encodeGifTbl(bytes, localTable = false)

  /** LOCAL-color-table variant: the screen descriptor carries NO
    * global table (GCT flag clear) and the image descriptor carries
    * the same 256-entry grayscale ramp as its local table (LCT flag +
    * size 7) — the per-image palette placement the GIF spec allows
    * and most decoders ignore until it bites. */
  private[graft] def encodeGifLct(bytes: Array[Byte]): Array[Byte] =
    encodeGifTbl(bytes, localTable = true)

  private def encodeGifTbl(bytes: Array[Byte],
      localTable: Boolean): Array[Byte] = {
    val w = 4
    val h = bytes.length / w
    val px = java.util.Arrays.copyOf(bytes, w * h)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def grayRamp(): Unit = {
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(if (localTable) 0x07 else 0xF7) // GCT flag + size bits
    out.write(0); out.write(0)
    if (!localTable) grayRamp()
    out.write(0x2C); u16(0); u16(0); u16(w); u16(h)
    out.write(if (localTable) 0x87 else 0) // LCT flag + size bits
    if (localTable) grayRamp()
    out.write(8) // LZW minimum code size
    writeGifLzwBlocks(out, px)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW compress of one raster + 255-byte sub-blocking
    * (shared by the single-image fixtures and q274's animation
    * frames). Variable code width 9→12 LSB-first, CLEAR/EOI,
    * dictionary reset at 4096. */
  private def writeGifLzwBlocks(out: java.io.ByteArrayOutputStream,
      px: Array[Byte]): Unit = {
    val Clear = 256
    val Eoi = 257
    val lzw = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt // LSB-first packing
      bitCnt += codeSize
      while (bitCnt >= 8) {
        lzw.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dict key = prefixCode << 8 | byte (prefix < 4096 -> fits Int)
    var table = new java.util.HashMap[Integer, Integer]()
    var free = Eoi + 1
    def reset(): Unit = { table = new java.util.HashMap(); free = Eoi + 1 }
    emit(Clear)
    if (px.nonEmpty) {
      var prev = px(0) & 0xff // root codes 0..255 are the bytes
      var j = 1
      while (j < px.length) {
        val c = px(j) & 0xff
        val key = (prev << 8) | c
        val hit = table.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          if (free < 4096) {
            table.put(key, free); free += 1
            // the just-assigned code needs one more bit once
            // free - 1 == 1 << codeSize; decoder bumps in lockstep
            if (free == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            emit(Clear); codeSize = 9; reset()
          }
          prev = c
        }
        j += 1
      }
      emit(prev)
      // the decoder performs one more dictionary add (for this final
      // code) before reading EOI; if that add lands exactly on a
      // power-of-two boundary the decoder widens first — mirror it,
      // or the EOI is written one bit narrower than it is read
      if (free == (1 << codeSize) && codeSize < 12)
        codeSize += 1
    }
    emit(Eoi)
    if (bitCnt > 0) lzw.write((bitBuf & 0xff).toInt)
    // --- sub-block the LZW stream ---
    val z = lzw.toByteArray
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      out.write(n); out.write(z, off, n); off += n
    }
    out.write(0) // block terminator
  }

  /** REAL GIF87a decode — pure-JVM parser with a full GIF-LZW
    * decompressor (variable code width, CLEAR resets, EOI, the KwKwK
    * code == free case, 12-bit cap). Validates signature, screen and
    * image descriptors, sub-block structure and the trailer;
    * interlace, local color tables and extensions are out of the
    * fixture's grammar and fail loudly rather than being guessed at.
    * Features come from the DECODED index stream, so any LZW bug is a
    * value mismatch against the payload-derived oracle. */
  private[graft] def decodeGif(docId: Long, bytes: Array[Byte])
      : GifDecoded = {
    def fail(why: String) =
      throw new IllegalArgumentException(s"gif decode [$docId]: $why")
    if (bytes.length < 13) fail(s"truncated header: ${bytes.length} B")
    if (new String(bytes, 0, 6, "US-ASCII") != "GIF87a")
      fail("bad signature")
    var p = 6
    def u16(): Int = {
      val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v
    }
    def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
    val sw = u16(); val sh = u16()
    val packed = u8(); u8(); u8() // background, aspect
    // whichever table the file carries (global in the screen
    // descriptor OR local in the image descriptor) must be the
    // 256-entry grayscale identity ramp — the property that makes
    // pixel index i ≡ payload byte i; the CONTENT is verified, not
    // assumed, so a decoder skipping the palette can't pass by luck
    def readGrayRamp(which: String): Unit = {
      if (p + 768 > bytes.length) fail(s"$which color table truncated")
      var i = 0
      while (i < 256) {
        val (r, g, b) =
          (bytes(p) & 0xff, bytes(p + 1) & 0xff, bytes(p + 2) & 0xff)
        if (r != i || g != i || b != i)
          fail(s"$which table entry $i not gray identity ($r,$g,$b)")
        p += 3; i += 1
      }
    }
    val hasGct = (packed & 0x80) != 0
    if (hasGct) {
      if ((2 << (packed & 7)) != 256) fail("expected 256-entry table")
      readGrayRamp("global")
    }
    if (p >= bytes.length) fail("missing image descriptor")
    if (u8() != 0x2C) fail("expected image descriptor")
    u16(); u16() // left, top
    val iw = u16(); val ih = u16()
    if (iw != sw || ih != sh) fail("sub-screen images unsupported")
    val ipacked = u8()
    if ((ipacked & 0x40) != 0) fail("interlace unsupported")
    val hasLct = (ipacked & 0x80) != 0
    if (hasLct && hasGct) fail("both color tables present")
    if (!hasLct && !hasGct) fail("no color table present")
    if (hasLct) {
      if ((2 << (ipacked & 7)) != 256) fail("expected 256-entry table")
      readGrayRamp("local")
    }
    val minCode = u8()
    if (minCode != 8) fail(s"unexpected min code size $minCode")
    // --- collect sub-blocks ---
    val z = new java.io.ByteArrayOutputStream()
    var bl = if (p < bytes.length) u8() else fail("missing data blocks")
    while (bl != 0) {
      if (p + bl > bytes.length) fail("sub-block truncated")
      z.write(bytes, p, bl); p += bl
      bl = if (p < bytes.length) u8() else fail("unterminated blocks")
    }
    if (p >= bytes.length || u8() != 0x3B) fail("missing trailer")
    val px = gifLzwDecompress(z.toByteArray, fail)
    if (px.length != iw * ih)
      fail(s"decoded ${px.length} pixels, raster needs ${iw * ih}")
    var sum = 0L
    var psum = 0L // position-weighted: catches shifts/permutations
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sum += v
      psum += (i + 1).toLong * v
      i += 1
    }
    GifDecoded(docId, iw, ih, px.length.toLong,
      if (px.length == 0) 0.0 else sum.toDouble / px.length,
      if (px.length == 0) 0 else px(0) & 0xff, psum)
  }

  /** GIF-variant LZW decompressor (shared by [[decodeGif]] and
    * q274's frame loop): variable code width, CLEAR resets, EOI, the
    * KwKwK code == free case, 12-bit cap. */
  private def gifLzwDecompress(data: Array[Byte],
      fail: String => Nothing): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    var codeSize = 9
    var bitPos = 0
    def read(): Int = {
      if (bitPos + codeSize > data.length * 8) fail("bitstream exhausted")
      var v = 0
      var got = 0
      while (got < codeSize) {
        val byteI = (bitPos + got) >> 3
        val bitI = (bitPos + got) & 7
        val take = math.min(8 - bitI, codeSize - got)
        val chunk = ((data(byteI) & 0xff) >> bitI) & ((1 << take) - 1)
        v |= chunk << got
        got += take
      }
      bitPos += codeSize
      v
    }
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var free = Eoi + 1
    def emitSeq(code: Int, sink: java.io.ByteArrayOutputStream): Byte = {
      // walk the prefix chain; returns the FIRST byte of the sequence
      var c = code
      val stack = new Array[Byte](4096)
      var sp = 0
      while (c >= 258) { stack(sp) = append(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      sink.write(c)
      while (sp > 0) { sp -= 1; sink.write(stack(sp) & 0xff) }
      first
    }
    val pixels = new java.io.ByteArrayOutputStream()
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == Clear) { codeSize = 9; free = Eoi + 1; prev = -1 }
      else if (code == Eoi) done = true
      else {
        if (prev < 0) { // first code after a clear: literal root
          if (code > 255) fail(s"non-root first code $code")
          pixels.write(code); prev = code
        } else {
          if (code > free) fail(s"code $code beyond dictionary $free")
          if (code == free) {
            // KwKwK: sequence = str(prev) + first(str(prev))
            val tmp = new java.io.ByteArrayOutputStream()
            val first = emitSeq(prev, tmp)
            if (free < 4096) {
              prefix(free) = prev; append(free) = first; free += 1
              if (free == (1 << codeSize) && codeSize < 12) codeSize += 1
            } else fail("dictionary overflow")
            tmp.writeTo(pixels); pixels.write(first & 0xff)
          } else {
            val tmp = new java.io.ByteArrayOutputStream()
            val first = emitSeq(code, tmp)
            if (free < 4096) {
              prefix(free) = prev; append(free) = first; free += 1
              if (free == (1 << codeSize) && codeSize < 12) codeSize += 1
            }
            tmp.writeTo(pixels)
          }
          prev = code
        }
      }
    }
    pixels.toByteArray
  }

  final case class GifAnimDecoded(doc_id: Long, n_frames: Int,
      loop_count: Int, total_delay_cs: Long, n_pixels: Long,
      mean_index: Double, first_frame_mean: Double,
      last_frame_mean: Double, pos_sum: Long)

  /** Animated GIF89a fixture encoder — the MULTI-IMAGE grammar the
    * 87a fixtures never exercise: screen 4×2 with the 256-gray GCT,
    * the NETSCAPE2.0 looping application extension (loop count =
    * doc_id % 5), then one frame per 8-byte payload slice, each
    * behind a Graphic Control Extension whose delay is
    * 1 + firstByte % 100 centiseconds. Tail bytes short of a frame
    * are dropped. */
  private[graft] def encodeGifAnim(docId: Long, bytes: Array[Byte])
      : Array[Byte] = {
    val w = 4
    val fh = 2
    val nf = bytes.length / (w * fh)
    require(nf >= 1, "encodeGifAnim needs at least one 8-byte frame")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(fh)
    out.write(0xF7); out.write(0); out.write(0)
    (0 until 256).foreach { i =>
      out.write(i); out.write(i); out.write(i)
    }
    out.write(0x21); out.write(0xFF); out.write(11) // app extension
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16((docId % 5).toInt); out.write(0)
    var f = 0
    while (f < nf) {
      val px = java.util.Arrays.copyOfRange(bytes, f * 8, f * 8 + 8)
      out.write(0x21); out.write(0xF9); out.write(4) // GCE
      out.write(0)                  // no disposal, no transparency
      u16(1 + (px(0) & 0xff) % 100) // delay, centiseconds
      out.write(0); out.write(0)    // transparent idx, terminator
      out.write(0x2C); u16(0); u16(0); u16(w); u16(fh); out.write(0)
      out.write(8)
      writeGifLzwBlocks(out, px)
      f += 1
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** REAL animated-GIF decode (GIF89a block grammar): signature,
    * screen descriptor + verified gray GCT, then the block loop —
    * Graphic Control Extensions (delay captured, must precede every
    * frame), the NETSCAPE2.0 looping extension (sub-block id 1,
    * u16 loop count), image descriptors each LZW-decoded with the
    * shared decompressor. Unknown extensions, frames without a GCE,
    * size mismatches, or a missing trailer all throw. Features span
    * ALL frames: global mean/position checksum plus first/last-frame
    * means (an decoder that drops or reorders frames moves one). */
  private[graft] def decodeGifAnim(docId: Long, bytes: Array[Byte])
      : GifAnimDecoded = {
    def fail(why: String) =
      throw new IllegalArgumentException(s"gif89a decode [$docId]: $why")
    if (bytes.length < 13) fail(s"truncated header: ${bytes.length} B")
    if (new String(bytes, 0, 6, "US-ASCII") != "GIF89a")
      fail("bad signature")
    var p = 6
    def u8(): Int = {
      if (p >= bytes.length) fail("truncated")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    val sw = u16(); val sh = u16()
    val packed = u8(); u8(); u8()
    if ((packed & 0x80) == 0) fail("expected a global color table")
    if ((2 << (packed & 7)) != 256) fail("expected 256-entry table")
    if (p + 768 > bytes.length) fail("global color table truncated")
    var ci = 0
    while (ci < 256) {
      if ((bytes(p) & 0xff) != ci || (bytes(p + 1) & 0xff) != ci ||
          (bytes(p + 2) & 0xff) != ci)
        fail(s"global table entry $ci not gray identity")
      p += 3; ci += 1
    }
    var loop = -1
    var pendingDelay = -1
    var totalDelay = 0L
    var nFrames = 0
    var sum = 0L
    var posSum = 0L
    var firstMean = 0.0
    var lastMean = 0.0
    var globalPos = 0L
    var done = false
    while (!done) {
      u8() match {
        case 0x3B => done = true
        case 0x21 => u8() match {
          case 0xF9 =>
            if (u8() != 4) fail("bad GCE block size")
            u8() // packed: disposal/transparency bits
            pendingDelay = u16()
            u8() // transparent index
            if (u8() != 0) fail("unterminated GCE")
          case 0xFF =>
            if (u8() != 11) fail("bad application block size")
            if (p + 11 > bytes.length) fail("app identifier truncated")
            val app = new String(bytes, p, 11, "US-ASCII")
            p += 11
            if (app != "NETSCAPE2.0")
              fail(s"application extension '$app' unsupported")
            if (u8() != 3 || u8() != 1) fail("bad loop sub-block")
            loop = u16()
            if (u8() != 0) fail("unterminated app extension")
          case other => fail(f"extension ff$other%02x unsupported")
        }
        case 0x2C =>
          u16(); u16()
          val iw = u16(); val ih = u16()
          if (iw != sw || ih != sh) fail("sub-screen frames unsupported")
          if (u8() != 0) fail("frame packed fields unsupported")
          if (u8() != 8) fail("unexpected min code size")
          val z = new java.io.ByteArrayOutputStream()
          var bl = u8()
          while (bl != 0) {
            if (p + bl > bytes.length) fail("sub-block truncated")
            z.write(bytes, p, bl); p += bl
            bl = u8()
          }
          val px = gifLzwDecompress(z.toByteArray, fail)
          if (px.length != iw * ih)
            fail(s"frame ${nFrames}: ${px.length} px != ${iw * ih}")
          if (pendingDelay < 0) fail(s"frame $nFrames without a GCE")
          totalDelay += pendingDelay
          pendingDelay = -1
          var fsum = 0L
          var i = 0
          while (i < px.length) {
            val v = px(i) & 0xff
            fsum += v
            globalPos += 1
            posSum += globalPos * v
            i += 1
          }
          sum += fsum
          val fm = fsum.toDouble / px.length
          if (nFrames == 0) firstMean = fm
          lastMean = fm
          nFrames += 1
        case other => fail(f"unexpected block $other%02x")
      }
    }
    if (p != bytes.length) fail("trailing bytes after trailer")
    if (nFrames == 0) fail("no frames before trailer")
    if (loop < 0) fail("missing NETSCAPE loop extension")
    GifAnimDecoded(docId, nFrames, loop, totalDelay, globalPos,
      sum.toDouble / globalPos, firstMean, lastMean, posSum)
  }

  /** q274's pipeline: same typed mapPartitions shape; payloads short
    * of one frame are filtered (none exist in the corpus — the
    * filter mirrors the oracle's WHERE). */
  def decodeGifAnimations(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs.filter(length(col("text")) >= 8))
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodeGifAnim(id, encodeGifAnim(id, b)) })
      .toDF()
  }

  /** q192's pipeline: the GIF twin of [[decodeImages]]/[[decodeImagesBmp]]
    * — same typed mapPartitions shape, third container format, real
    * compression inside the round-trip. */
  def decodeImagesGif(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeGif(id, encodeGif(b)) })
      .toDF()
  }

  /** q248's pipeline: the LOCAL-color-table GIF variant — same LZW
    * round-trip, palette carried per-image in the descriptor instead
    * of globally, and the decoder verifies the ramp CONTENT either
    * way. */
  def decodeImagesGifLct(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodeGif(id, encodeGifLct(b)) })
      .toDF()
  }

  final case class PngDecoded(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_gray: Double, top_left_gray: Int,
      pos_sum: Long)

  /** PNG's Paeth predictor (spec §9, filter type 4): the neighbor
    * (left/up/up-left) closest to p = a + b − c, ties resolved in
    * that order. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Scanline predictor shared by [[encodePng]] (subtract) and
    * [[decodePng]] (add back): filter types 0–4 = None/Sub/Up/
    * Average/Paeth over the (left, up, up-left) neighborhood at
    * bpp = 1 (grayscale 8-bit). Returns −1 on an unknown type so the
    * decoder can fail loudly. */
  private def pngPredict(f: Int, a: Int, b: Int, c: Int): Int = f match {
    case 0 => 0
    case 1 => a
    case 2 => b
    case 3 => (a + b) / 2
    case 4 => paeth(a, b, c)
    case _ => -1
  }

  /** PNG fixture encoder — the fourth image container, and the first
    * whose round-trip crosses BOTH real compression (zlib/DEFLATE via
    * the JVM's `Deflater`, Adler-32 trailer included) and real
    * per-scanline prediction: row r is filtered with type r % 5, so a
    * decoder that botches ANY of None/Sub/Up/Average/Paeth breaks the
    * value oracle. Grayscale 8-bit (color type 0) at width 4 makes
    * pixel i ≡ payload byte i; height = len/4 full rows, tail bytes
    * dropped as the oracle recomputes. The IDAT stream is split into
    * ≤ 96-byte chunks to exercise multi-IDAT concatenation, and every
    * chunk carries its spec CRC-32 over type + data. */
  private[graft] def encodePng(bytes: Array[Byte]): Array[Byte] =
    encodePngCh(bytes, 1)

  /** Adam7-interlaced grayscale variant — same final raster (pixel i
    * = payload byte i at width 4), stored as the spec's seven
    * sub-image passes, each filtered pass-locally. A decoder that
    * defilters across pass boundaries or scatters pixels to the wrong
    * (x0 + i*dx, y0 + j*dy) grid breaks the value oracle. */
  private[graft] def encodePngAdam7(bytes: Array[Byte]): Array[Byte] =
    encodePngCh(bytes, 1, interlaced = true)

  /** Truecolor variant: color type 2, bpp = 3 — payload byte i is
    * raster channel byte i (pixel i/3, channel i%3), h = len/12 full
    * rows. The filter sweep is the SAME r % 5 cycle, now exercising
    * the spec's multi-byte-pixel rule: the `left` neighbor of a byte
    * is the corresponding byte of the previous PIXEL (offset bpp,
    * not 1 — PNG spec §9, "bpp is defined as the number of bytes per
    * complete pixel"). */
  private[graft] def encodePngRgb(bytes: Array[Byte]): Array[Byte] =
    encodePngCh(bytes, 3)

  /** RGBA variant: color type 6, bpp = 4 — the widest pixel the spec's
    * byte-offset filter rule covers; h = len/16 full rows. */
  private[graft] def encodePngRgba(bytes: Array[Byte]): Array[Byte] =
    encodePngCh(bytes, 4)

  /** Filter one (sub-)image: rows x rowB bytes -> rows x (1 + rowB)
    * raw scanlines, row r filtered with type (r + fBase) % 5 against
    * pass-local neighbors — the encode twin of [[pngDefilter]]. */
  private def pngFilter(img: Array[Byte], rows: Int, rowB: Int,
      ch: Int, fBase: Int): Array[Byte] = {
    val raw = new Array[Byte](rows * (rowB + 1))
    var r = 0
    while (r < rows) {
      val f = (r + fBase) % 5
      raw(r * (rowB + 1)) = f.toByte
      var x = 0
      while (x < rowB) {
        val orig = img(r * rowB + x) & 0xff
        val a = if (x >= ch) img(r * rowB + x - ch) & 0xff else 0
        val b = if (r > 0) img((r - 1) * rowB + x) & 0xff else 0
        val c = if (x >= ch && r > 0)
          img((r - 1) * rowB + x - ch) & 0xff
          else 0
        raw(r * (rowB + 1) + 1 + x) =
          ((orig - pngPredict(f, a, b, c)) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    raw
  }

  /** Paletted variant: color type 3 with a 256-entry gray-identity
    * PLTE, so index i == gray value i and every q196 feature carries
    * over while the decoder must honor the palette chunk. */
  private[graft] def encodePngPal(bytes: Array[Byte]): Array[Byte] =
    encodePngCh(bytes, 1, palette = true)

  private def encodePngCh(bytes: Array[Byte], ch: Int,
      interlaced: Boolean = false,
      palette: Boolean = false): Array[Byte] = {
    val w = 4
    val rowB = w * ch
    val h = bytes.length / rowB
    val raw: Array[Byte] =
      if (!interlaced) pngFilter(bytes, h, rowB, ch, fBase = 0)
      else {
        // Adam7: extract each pass sub-image from the final raster,
        // filter it pass-locally (fBase cycles across passes so the
        // sweep still crosses all five filter types), concatenate
        val outBuf = new java.io.ByteArrayOutputStream()
        Adam7.zipWithIndex.foreach { case ((x0, y0, dx, dy), pi) =>
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](ph * pw * ch)
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                var k = 0
                while (k < ch) {
                  sub(j * pw * ch + i * ch + k) =
                    bytes((y0 + j * dy) * rowB + (x0 + i * dx) * ch + k)
                  k += 1
                }
                i += 1
              }
              j += 1
            }
            outBuf.write(pngFilter(sub, ph, pw * ch, ch, fBase = pi))
          }
        }
        outBuf.toByteArray
      }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zb.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zb.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte], from: Int, len: Int)
        : Unit = {
      val t = typ.getBytes("US-ASCII")
      def be32(v: Int): Unit = {
        out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff)
      }
      be32(len)
      out.write(t, 0, 4)
      out.write(data, from, len)
      val crc = new java.util.zip.CRC32()
      crc.update(t)
      crc.update(data, from, len)
      be32(crc.getValue.toInt)
    }
    // bit depth 8; color type 0 (gray) at ch=1, 2 (truecolor) at
    // ch=3, 6 (truecolor + alpha) at ch=4, 3 (paletted) on request
    val colorType =
      if (palette) 3 else if (ch == 4) 6 else if (ch == 3) 2 else 0
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte)
      .put(colorType.toByte)
      .put(0.toByte).put(0.toByte) // deflate, adaptive
      .put((if (interlaced) 1 else 0).toByte)
      .array()
    chunk("IHDR", ihdr, 0, 13)
    if (palette) {
      val plte = new Array[Byte](768)
      var e = 0
      while (e < 256) {
        plte(3 * e) = e.toByte; plte(3 * e + 1) = e.toByte
        plte(3 * e + 2) = e.toByte
        e += 1
      }
      chunk("PLTE", plte, 0, 768)
    }
    var off = 0
    while (off < z.length) { // multi-IDAT: ≤ 96-byte slices
      val n = math.min(96, z.length - off)
      chunk("IDAT", z, off, n)
      off += n
    }
    chunk("IEND", Array.emptyByteArray, 0, 0)
    out.toByteArray
  }

  /** REAL PNG decode — pure-JVM parser per the published PNG spec:
    * 8-byte signature, chunk walk with CRC-32 verified on EVERY chunk
    * (a flipped bit anywhere is a loud failure, as is a truncated or
    * non-consecutive IDAT run, trailing bytes after IEND, or a chunk
    * type outside the fixture's grammar), IHDR validation (bit depth
    * 8, color type 0, deflate/adaptive/no-interlace), multi-IDAT
    * concatenation, zlib inflate via the JVM's `Inflater` (Adler-32
    * checked), exact decompressed-length accounting, and full inverse
    * filtering of all five scanline predictors. Features come from
    * the UNFILTERED pixels, so a prediction bug in any filter type is
    * a value mismatch against the payload-derived oracle. */
  private[graft] def decodePng(docId: Long, bytes: Array[Byte])
      : PngDecoded = {
    val (w, h, _, ct, px) = decodePngRaster(docId, bytes)
    if (ct != 0)
      throw new IllegalArgumentException(
        s"png decode [$docId]: color type != gray")
    var sum = 0L
    var psum = 0L
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sum += v
      psum += (i + 1).toLong * v
      i += 1
    }
    PngDecoded(docId, w, h, px.length.toLong,
      if (px.length == 0) 0.0 else sum.toDouble / px.length,
      if (px.length == 0) 0 else px(0) & 0xff, psum)
  }

  final case class PngPalDecoded(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, n_palette: Int, mean_index: Double,
      top_left_index: Int, pos_sum: Long)

  /** Paletted features — q196's byte algebra through the PLTE path:
    * the raster holds INDEX bytes and the (content-verified) identity
    * ramp makes index i ≡ payload byte i. */
  private[graft] def decodePngPal(docId: Long, bytes: Array[Byte])
      : PngPalDecoded = {
    val (w, h, _, ct, px) = decodePngRaster(docId, bytes)
    if (ct != 3)
      throw new IllegalArgumentException(
        s"png decode [$docId]: color type != paletted")
    var sum = 0L
    var psum = 0L
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sum += v
      psum += (i + 1).toLong * v
      i += 1
    }
    PngPalDecoded(docId, w, h, px.length.toLong, 256,
      if (px.length == 0) 0.0 else sum.toDouble / px.length,
      if (px.length == 0) 0 else px(0) & 0xff, psum)
  }

  /** q277's pipeline: same typed mapPartitions shape. */
  def decodeImagesPngPal(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodePngPal(id, encodePngPal(b)) })
      .toDF()
  }

  final case class PngRgbDecoded(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_r: Double, mean_g: Double, mean_b: Double,
      top_left_r: Int, pos_sum: Long)

  /** Truecolor features off the same verified raster walk: per-channel
    * means (each channel holds exactly w·h bytes), top-left RED byte,
    * and the position-weighted checksum over the interleaved raster —
    * a decoder that swaps channels or mis-offsets the bpp-aware
    * filters moves a per-channel mean, not just the total. */
  private[graft] def decodePngRgb(docId: Long, bytes: Array[Byte])
      : PngRgbDecoded = {
    val (w, h, _, ct, px) = decodePngRaster(docId, bytes)
    if (ct != 2)
      throw new IllegalArgumentException(
        s"png decode [$docId]: color type != truecolor")
    val sums = new Array[Long](3)
    var psum = 0L
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sums(i % 3) += v
      psum += (i + 1).toLong * v
      i += 1
    }
    val np = w.toLong * h
    PngRgbDecoded(docId, w, h, np,
      if (np == 0) 0.0 else sums(0).toDouble / np,
      if (np == 0) 0.0 else sums(1).toDouble / np,
      if (np == 0) 0.0 else sums(2).toDouble / np,
      if (px.length == 0) 0 else px(0) & 0xff, psum)
  }

  final case class PngRgbaDecoded(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_r: Double, mean_g: Double, mean_b: Double,
      mean_a: Double, top_left_r: Int, pos_sum: Long)

  /** RGBA features — the 4-byte-pixel twin of [[decodePngRgb]]; the
    * alpha plane gets its own mean (a padding/stride bug that reads
    * alpha into color shifts two means at once). */
  private[graft] def decodePngRgba(docId: Long, bytes: Array[Byte])
      : PngRgbaDecoded = {
    val (w, h, _, ct, px) = decodePngRaster(docId, bytes)
    if (ct != 6)
      throw new IllegalArgumentException(
        s"png decode [$docId]: color type != truecolor+alpha")
    val sums = new Array[Long](4)
    var psum = 0L
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sums(i % 4) += v
      psum += (i + 1).toLong * v
      i += 1
    }
    val np = w.toLong * h
    def m(c: Int) = if (np == 0) 0.0 else sums(c).toDouble / np
    PngRgbaDecoded(docId, w, h, np, m(0), m(1), m(2), m(3),
      if (px.length == 0) 0 else px(0) & 0xff, psum)
  }

  /** The verified chunk walk + inflate + inverse filter shared by the
    * gray, truecolor and RGBA decoders; returns (width, height,
    * channels, unfiltered raster). Channels come from the IHDR color
    * type (0 → 1, 2 → 3, 6 → 4); all filters operate bytewise at the
    * bpp offset. */
  private def decodePngRaster(docId: Long, bytes: Array[Byte])
      : (Int, Int, Int, Int, Array[Byte]) = {
    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"png decode [$docId]: $why")
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a,
      0x1a, 0x0a)
    if (bytes.length < 8 ||
        (0 until 8).exists(i => (bytes(i) & 0xff) != sig(i)))
      fail("bad signature")
    def be32(at: Int): Int =
      ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
        ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
    var p = 8
    var w = -1
    var h = -1
    var ch = -1
    var ct = -1
    var interlace = 0
    var seenPlte = false
    var seenIhdr = false
    var seenIend = false
    var idatDone = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (p + 8 > bytes.length) fail("truncated chunk header")
      val len = be32(p)
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      if (len < 0 || p + 12 + len > bytes.length)
        fail(s"chunk $typ truncated")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, p + 4, 4 + len)
      if (crc.getValue.toInt != be32(p + 8 + len))
        fail(s"chunk $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          if (seenIhdr) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len")
          w = be32(p + 8)
          h = be32(p + 12)
          if (w < 0 || h < 0) fail(s"bad dims ${w}x$h")
          if ((bytes(p + 16) & 0xff) != 8) fail("bit depth != 8")
          ct = bytes(p + 17) & 0xff
          ch = ct match {
            case 0 => 1
            case 2 => 3
            case 3 => 1 // paletted: one index byte per pixel
            case 6 => 4
            case t => fail(s"unsupported color type $t")
          }
          if ((bytes(p + 18) & 0xff) != 0) fail("bad compression")
          if ((bytes(p + 19) & 0xff) != 0) fail("bad filter method")
          interlace = bytes(p + 20) & 0xff
          if (interlace != 0 && interlace != 1)
            fail(s"interlace method $interlace unsupported")
          seenIhdr = true
        case "PLTE" =>
          if (!seenIhdr) fail("PLTE before IHDR")
          if (ct != 3) fail("PLTE outside the paletted grammar")
          if (seenPlte) fail("duplicate PLTE")
          if (idat.size() > 0) fail("PLTE after IDAT")
          if (len != 768) fail(s"expected 256-entry palette, got $len B")
          // CONTENT verified, not assumed (the GIF-LCT discipline):
          // the identity gray ramp is what makes index i == value i
          var e = 0
          while (e < 256) {
            val o = p + 8 + 3 * e
            if ((bytes(o) & 0xff) != e || (bytes(o + 1) & 0xff) != e ||
                (bytes(o + 2) & 0xff) != e)
              fail(s"palette entry $e not gray identity")
            e += 1
          }
          seenPlte = true
        case "IDAT" =>
          if (!seenIhdr) fail("IDAT before IHDR")
          if (ct == 3 && !seenPlte) fail("paletted image without PLTE")
          if (idatDone) fail("non-consecutive IDAT") // spec: one run
          idat.write(bytes, p + 8, len)
        case "IEND" =>
          if (!seenIhdr) fail("IEND before IHDR")
          if (len != 0) fail("IEND not empty")
          seenIend = true
        case t => fail(s"unsupported chunk $t")
      }
      if (typ != "IDAT" && idat.size() > 0) idatDone = true
      p += 12 + len
    }
    if (p != bytes.length) fail("trailing bytes after IEND")
    if (idat.size() == 0) fail("missing IDAT")
    val rowB = w * ch
    // Adam7 (spec 2.6/8.2): seven sub-image passes; a pass with zero
    // columns or rows contributes NO scanlines at all
    val passes =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Adam7
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      (pw, ph)
    }
    val rawLen = passDims.map { case (pw, ph) =>
      if (pw == 0 || ph == 0) 0L else ph.toLong * (pw * ch + 1)
    }.sum
    if (rawLen > Int.MaxValue) fail("raster too large")
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) fail("zlib stream truncated")
        got += n
      }
      // the stream must END here: one more inflate either consumes
      // just the Adler-32 trailer (returns 0, finished) or proves the
      // geometry lied
      val extra = new Array[Byte](1)
      if (inf.inflate(extra) > 0) fail("decompressed data exceeds raster")
      if (!inf.finished()) fail("zlib stream not finished")
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"zlib: ${e.getMessage}")
    } finally inf.end()
    if (got != raw.length)
      fail(s"decompressed $got, raster needs ${raw.length}")
    val px = new Array[Byte](rowB * h)
    var off = 0
    passes.zip(passDims).foreach { case ((x0, y0, dx, dy), (pw, ph)) =>
      if (pw > 0 && ph > 0) {
        // filters apply WITHIN the pass sub-image (spec: "each pass
        // is treated as an independent image for filtering purposes")
        val sub = pngDefilter(raw, off, ph, pw * ch, ch, fail)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            var k = 0
            while (k < ch) {
              px((y0 + j * dy) * rowB + (x0 + i * dx) * ch + k) =
                sub(j * pw * ch + i * ch + k)
              k += 1
            }
            i += 1
          }
          j += 1
        }
        off += ph * (pw * ch + 1)
      }
    }
    (w, h, ch, ct, px)
  }

  /** The seven Adam7 passes as (x0, y0, dx, dy) — PNG spec table 8.2. */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Undo per-scanline filtering over one (sub-)image region of the
    * raw stream: rows scanlines of rowB bytes each, led by a filter
    * byte; neighbors are pass-local per the spec. */
  private def pngDefilter(raw: Array[Byte], off: Int, rows: Int,
      rowB: Int, ch: Int, fail: String => Nothing): Array[Byte] = {
    val px = new Array[Byte](rows * rowB)
    var r = 0
    while (r < rows) {
      val f = raw(off + r * (rowB + 1)) & 0xff
      var x = 0
      while (x < rowB) {
        val v = raw(off + r * (rowB + 1) + 1 + x) & 0xff
        val a = if (x >= ch) px(r * rowB + x - ch) & 0xff else 0
        val b = if (r > 0) px((r - 1) * rowB + x) & 0xff else 0
        val c = if (x >= ch && r > 0)
          px((r - 1) * rowB + x - ch) & 0xff
          else 0
        val pred = pngPredict(f, a, b, c)
        if (pred < 0) fail(s"unknown filter type $f")
        px(r * rowB + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    px
  }

  /** q196's pipeline: the PNG twin of [[decodeImagesGif]] — same typed
    * mapPartitions shape, fourth container format, zlib compression
    * AND per-scanline prediction inside the round-trip. */
  def decodeImagesPng(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodePng(id, encodePng(b)) })
      .toDF()
  }

  /** q241's pipeline: truecolor PNG (color type 2) — the same typed
    * mapPartitions shape as [[decodeImagesPng]], now with 3-byte
    * pixels so the inverse filters must honor the spec's bpp offset
    * and the features split per channel. */
  def decodeImagesPngRgb(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodePngRgb(id, encodePngRgb(b)) })
      .toDF()
  }

  /** q243's pipeline: RGBA (color type 6) — 4-byte pixels, the widest
    * bpp the filter rule covers, alpha audited as its own plane. */
  def decodeImagesPngRgba(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodePngRgba(id, encodePngRgba(b)) })
      .toDF()
  }

  final case class Audio(doc_id: Long, n_bytes: Int, sample_rate: Int,
      n_samples: Long, duration_us: Long, peak: Int, rms: Double)

  /** Audio fixture encoder: pack the payload into a canonical 44-byte
    * RIFF/WAVE PCM (16-bit mono, 8 kHz). Sample i is the SIGNED 16-bit
    * value of payload byte pair (2i, 2i+1) read big-endian —
    * v = b0*256 + b1, sign-wrapped — then written little-endian as the
    * WAV spec requires; a byte-order bug in the decoder flips values
    * and shows up in peak/rms. Trailing odd byte dropped (len/2 full
    * samples), mirroring the oracle's `len // 2`. */
  private[graft] def encodeWav(bytes: Array[Byte]): Array[Byte] = {
    val ns = bytes.length / 2
    val dataLen = ns * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // rate, byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < ns) {
      val v = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff))
        .toShort
      out.putShort(v)
      i += 1
    }
    out.array()
  }

  /** Parsed WAV payload: format fields + per-channel running stats
    * (peak |amplitude|, exact integer sum of squares) accumulated in
    * one pass over the interleaved frame stream — no sample array is
    * materialized. */
  private final case class WavRaw(fmt: Int, rate: Int, ch: Int,
      bits: Int, frames: Long, peak: Array[Int], sumSq: Array[Long])

  /** G.711 μ-law expansion (the classic CCITT/Sun `ulaw2linear`):
    * complement the code, rebuild the biased segment/mantissa
    * magnitude, subtract the bias back out. Pure integer — range
    * ±32124 — so peak/RMS stay exact and any engine reproduces it
    * with shifts and adds. */
  private[graft] def ulaw2linear(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (the classic CCITT/Sun `alaw2linear`):
    * toggle the even bits (the spec's 0x55 mask), rebuild the
    * segment/mantissa magnitude — segment 0 is linear (+8 bias),
    * segments 1–7 shift a 0x108-biased mantissa — and apply the sign
    * bit (set = positive, the opposite polarity convention from
    * μ-law). Pure integer, range ±32256, so peak/RMS stay exact and
    * any engine reproduces it with shifts and adds. */
  private[graft] def alaw2linear(code: Int): Int = {
    val a = code ^ 0x55
    val t0 = (a & 0x0f) << 4
    val t = ((a & 0x70) >> 4) match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case s => (t0 + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** REAL WAV chunk walker — pure-JVM RIFF parse per the published
    * WAVE format: RIFF header, then (id, size LE) chunks with
    * odd-size pad bytes, `fmt ` validated (integer PCM with 8 or 16
    * bits, or 8-bit G.711 μ-law, 1–2 channels), `data` the
    * interleaved frame stream. 16-bit samples are signed
    * little-endian; 8-bit PCM samples are UNSIGNED per the spec and
    * re-centered to [-128, 127]; μ-law bytes expand through
    * [[ulaw2linear]] to their 16-bit values. Unknown chunks are
    * SKIPPED (the spec allows LIST/INFO etc); malformed payloads
    * throw — fabricated audio poisons everything downstream. */
  private def walkWav(docId: Long, bytes: Array[Byte]): WavRaw = {
    def fail(why: String) =
      throw new IllegalArgumentException(s"wav decode [$docId]: $why")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      if (bb.remaining() < 4) fail("truncated fourcc")
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail("missing RIFF")
    bb.getInt() // riff size (trusting chunk walk, validated per chunk)
    if (fourcc() != "WAVE") fail("missing WAVE")
    var fmt = -1
    var rate = -1
    var ch = -1
    var bits = -1
    var haveFmt = false
    var haveData = false
    var frames = 0L
    var peak: Array[Int] = null
    var sumSq: Array[Long] = null
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt()
      if (size < 0 || size > bb.remaining()) fail(s"bad chunk size $size")
      val next = bb.position() + size + (size & 1) // odd sizes pad
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          fmt = bb.getShort().toInt; ch = bb.getShort().toInt
          rate = bb.getInt(); bb.getInt(); bb.getShort()
          bits = bb.getShort().toInt
          if (fmt != 1 && fmt != 7 && fmt != 6)
            fail(s"not PCM/μ-law/A-law: format $fmt")
          if (ch < 1 || ch > 2) fail(s"unsupported channel count $ch")
          if ((fmt == 7 || fmt == 6) && bits != 8)
            fail(s"G.711 must be 8-bit: $bits")
          if (bits != 8 && bits != 16) fail(s"unsupported bit depth $bits")
          if (rate <= 0) fail(s"bad rate $rate")
          haveFmt = true
        case "data" =>
          if (!haveFmt) fail("data before fmt")
          haveData = true
          val block = ch * (bits / 8)
          frames = (size / block).toLong
          peak = new Array[Int](ch)
          sumSq = new Array[Long](ch)
          var f = 0L
          while (f < frames) {
            var c = 0
            while (c < ch) {
              val v =
                if (fmt == 7) ulaw2linear(bb.get() & 0xff)
                else if (fmt == 6) alaw2linear(bb.get() & 0xff)
                else if (bits == 16) bb.getShort().toInt
                else (bb.get() & 0xff) - 128 // PCM8 is unsigned
              val a = math.abs(v)
              if (a > peak(c)) peak(c) = a
              sumSq(c) += v.toLong * v
              c += 1
            }
            f += 1
          }
        case _ => () // LIST/INFO/fact/...: skip
      }
      bb.position(math.min(next, bytes.length))
    }
    if (!haveFmt) fail("no fmt chunk")
    if (!haveData) fail("no data chunk")
    if (peak == null) { peak = new Array[Int](ch); sumSq = new Array[Long](ch) }
    WavRaw(fmt, rate, ch, bits, frames, peak, sumSq)
  }

  /** q161's PCM16-mono decode over the generic walker — stricter than
    * the container: a stereo or 8-bit payload throws rather than being
    * silently averaged. Features: sample count, integer microsecond
    * duration, peak |amplitude|, RMS (exact integer sum of squares,
    * one final sqrt). */
  private[graft] def decodeWav(docId: Long, bytes: Array[Byte]): Audio = {
    val r = walkWav(docId, bytes)
    if (r.fmt != 1) throw new IllegalArgumentException(
      s"wav decode [$docId]: not integer PCM: format ${r.fmt}")
    if (r.ch != 1) throw new IllegalArgumentException(
      s"wav decode [$docId]: not mono: ${r.ch} channels")
    if (r.bits != 16) throw new IllegalArgumentException(
      s"wav decode [$docId]: not 16-bit: ${r.bits}")
    val n = r.frames
    Audio(docId, bytes.length, r.rate, n, n * 1000000L / r.rate,
      r.peak(0),
      if (n == 0) 0.0 else math.sqrt(r.sumSq(0).toDouble / n))
  }

  final case class AudioStereo(doc_id: Long, n_bytes: Int,
      sample_rate: Int, n_frames: Long, duration_us: Long,
      peak_l: Int, peak_r: Int, rms_l: Double, rms_r: Double)

  /** Stereo 8-bit fixture encoder: pack the payload into a canonical
    * 44-byte RIFF/WAVE PCM (8-bit stereo, 11.025 kHz). Frame i is the
    * raw byte pair — L = payload byte 2i, R = payload byte 2i+1 —
    * stored verbatim as the UNSIGNED samples the PCM8 spec requires
    * (a decoder that sign-extends instead of re-centering shows up in
    * peak/rms). Trailing odd byte dropped (len/2 full frames),
    * mirroring the oracle's `len // 2`. */
  private[graft] def encodeWavStereo8(bytes: Array[Byte]): Array[Byte] = {
    val frames = bytes.length / 2
    val dataLen = frames * 2 // 2 channels x 1 byte
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2) // PCM, stereo
      .putInt(11025).putInt(22050) // rate, byte rate
      .putShort(2).putShort(8) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(bytes, 0, dataLen)
    out.array()
  }

  /** q186's stereo-PCM8 decode over the generic walker — per-channel
    * peak and RMS from the interleaved frame stream; frame count (not
    * flat sample count) drives duration. */
  private[graft] def decodeWavStereo8(docId: Long, bytes: Array[Byte])
      : AudioStereo = {
    val r = walkWav(docId, bytes)
    if (r.fmt != 1) throw new IllegalArgumentException(
      s"wav decode [$docId]: not integer PCM: format ${r.fmt}")
    if (r.ch != 2) throw new IllegalArgumentException(
      s"wav decode [$docId]: not stereo: ${r.ch} channels")
    if (r.bits != 8) throw new IllegalArgumentException(
      s"wav decode [$docId]: not 8-bit: ${r.bits}")
    val n = r.frames
    def rms(c: Int) =
      if (n == 0) 0.0 else math.sqrt(r.sumSq(c).toDouble / n)
    AudioStereo(docId, bytes.length, r.rate, n, n * 1000000L / r.rate,
      r.peak(0), r.peak(1), rms(0), rms(1))
  }

  /** μ-law fixture encoder: the payload bytes ARE the G.711 codes —
    * one byte per sample, stored verbatim in a canonical 44-byte
    * RIFF/WAVE container with format tag 7 (WAVE_FORMAT_MULAW),
    * 8-bit mono at the G.711-standard 8 kHz. The decoder must expand
    * every code through the published companding curve; treating the
    * bytes as PCM8 (or sign-extending) lands peak/RMS in a completely
    * different range and fails the oracle. */
  private[graft] def encodeWavMulaw(bytes: Array[Byte]): Array[Byte] = {
    val ns = bytes.length
    val out = java.nio.ByteBuffer.allocate(44 + ns)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + ns)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7).putShort(1) // μ-law, mono
      .putInt(8000).putInt(8000) // rate, byte rate
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(ns)
      .put(bytes, 0, ns)
    out.array()
  }

  /** q199's μ-law decode over the generic walker — strict on the
    * format tag (an integer-PCM payload throws; no silent
    * reinterpretation), features over the EXPANDED 16-bit values. */
  private[graft] def decodeWavMulaw(docId: Long, bytes: Array[Byte])
      : Audio = {
    val r = walkWav(docId, bytes)
    if (r.fmt != 7) throw new IllegalArgumentException(
      s"wav decode [$docId]: not μ-law: format ${r.fmt}")
    if (r.ch != 1) throw new IllegalArgumentException(
      s"wav decode [$docId]: not mono: ${r.ch} channels")
    val n = r.frames
    Audio(docId, bytes.length, r.rate, n, n * 1000000L / r.rate,
      r.peak(0),
      if (n == 0) 0.0 else math.sqrt(r.sumSq(0).toDouble / n))
  }

  /** A-law fixture encoder: the μ-law fixture's twin with format tag
    * 6 (WAVE_FORMAT_ALAW) — payload bytes ARE the A-law codes. */
  private[graft] def encodeWavAlaw(bytes: Array[Byte]): Array[Byte] = {
    val ns = bytes.length
    val out = java.nio.ByteBuffer.allocate(44 + ns)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + ns)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(6).putShort(1) // A-law, mono
      .putInt(8000).putInt(8000) // rate, byte rate
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(ns)
      .put(bytes, 0, ns)
    out.array()
  }

  /** q256's A-law decode — strict on format tag 6; a μ-law or PCM
    * payload throws rather than expanding through the wrong curve
    * (the two G.711 curves differ on EVERY code). */
  private[graft] def decodeWavAlaw(docId: Long, bytes: Array[Byte])
      : Audio = {
    val r = walkWav(docId, bytes)
    if (r.fmt != 6) throw new IllegalArgumentException(
      s"wav decode [$docId]: not A-law: format ${r.fmt}")
    if (r.ch != 1) throw new IllegalArgumentException(
      s"wav decode [$docId]: not mono: ${r.ch} channels")
    val n = r.frames
    Audio(docId, bytes.length, r.rate, n, n * 1000000L / r.rate,
      r.peak(0),
      if (n == 0) 0.0 else math.sqrt(r.sumSq(0).toDouble / n))
  }

  /** Binary A-law ingest + partition-wise decode — q256's pipeline. */
  def decodeAudioAlaw(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavAlaw(id, encodeWavAlaw(bytes)) }
      }.toDF()
  }

  /** Binary μ-law ingest + partition-wise decode — q199's pipeline,
    * same typed mapPartitions shape as [[decodeAudio]]. */
  def decodeAudioMulaw(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavMulaw(id, encodeWavMulaw(bytes)) }
      }.toDF()
  }

  /** Binary stereo-audio ingest + partition-wise decode — q186's
    * pipeline, same typed mapPartitions shape as [[decodeAudio]]. */
  def decodeAudioStereo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavStereo8(id, encodeWavStereo8(bytes)) }
      }.toDF()
  }

  /** Binary audio ingest + partition-wise decode — the audio twin of
    * [[decodeImages]] (same typed mapPartitions shape; a production
    * decoder would init libsndfile/ffmpeg once per partition). */
  def decodeAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => decodeWav(id, encodeWav(bytes)) }
      }.toDF()
  }

  /** Binary ingest + partition-wise decode. At scale the repartition
    * count follows payload bytes per partition, not row count. The
    * fixture encode (text → PPM payload) stands in for the upstream
    * system that produced the binary column. */
  def decodeImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: init codec once here, per partition
        it.map { case (id, bytes) => decodeNetpbm(id, encodePpm(bytes)) }
      }.toDF()
  }

  /** Frame sampling: treat the payload as a "video" of fixed-size
    * frames, keep every `stride`-th frame. One output row per sampled
    * frame with typed metadata + a per-frame feature — the exploded
    * (asset, frame) shape a video pipeline feeds to inference. The
    * frame "decode" is the same deterministic fake byte math. */
  def sampleFrames(docs: DataFrame, frameBytes: Int, stride: Int)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: init the demuxer once per partition
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes // full frames only
          (0 until nFrames by stride).iterator.map { f =>
            var sum = 0L
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) { sum += bytes(i) & 0xff; i += 1 }
            Frame(id, f, frameBytes, sum.toDouble / frameBytes)
          }
        }
      }.toDF()
  }

  /** "Resize": stride-subsample the payload bytes (the fake analogue
    * of nearest-neighbor image downscaling) producing a new, smaller
    * binary payload + its metadata — binary-in/binary-out plumbing. */
  def resize(docs: DataFrame, stride: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = Array.range(0, bytes.length, stride).map(bytes(_))
          val mean =
            if (out.isEmpty) 0.0
            else out.map(_ & 0xff).map(_.toLong).sum.toDouble / out.length
          Resized(id, bytes.length, out, out.length, mean)
        }
      }.toDF()
  }

  /** dHash-style perceptual hash over the 4×h PPM raster, adapted to
    * the fixture geometry: luminance = RGB byte sum per pixel, 8 rows
    * sampled evenly (floor(r·h/8)), bit (r,c) = L(r,c) > L(r,c+1) for
    * the 3 horizontal neighbor pairs → a 24-bit gradient signature,
    * the standard near-duplicate-image key (identical gradients ⇒
    * identical hash regardless of absolute brightness). The SQL is
    * GENERATED once and evaluated verbatim by BOTH engines (ascii /
    * substring / FLOOR are common dialect), so the oracle can't drift
    * from the operator. */
  private[graft] def phashSql(t: String, h: String): String = {
    val terms = for (r <- 0 until 8; c <- 0 until 3) yield {
      def lum(cc: Int): String = {
        val row = s"CAST(FLOOR(($r * $h) / 8.0) AS INT)"
        val base = s"(12 * $row + ${3 * cc})"
        s"(ascii(substring($t, $base + 1, 1)) " +
          s"+ ascii(substring($t, $base + 2, 1)) " +
          s"+ ascii(substring($t, $base + 3, 1)))"
      }
      s"(CASE WHEN ${lum(c)} > ${lum(c + 1)} " +
        s"THEN ${1L << (r * 3 + c)} ELSE 0 END)"
    }
    terms.mkString("CAST((", " + ", ") AS BIGINT)")
  }

  // ------------------------------------------------------------------
  // Baseline JPEG (ITU T.81): the highest-frequency real-corpus image
  // format. Encode is the fixture; decode is the product — a real
  // sequential-DCT baseline decoder: marker walk (SOI/APPn/DQT/SOF0/
  // DHT/SOS/EOI), canonical Huffman table build, entropy decode with
  // byte unstuffing, DC difference coding, AC run-length + ZRL + EOB,
  // zigzag -> natural order, dequantization, separable 2-D IDCT,
  // level shift + clamp, YCbCr -> RGB.
  //
  // JPEG is LOSSY, and the oracle discipline here is exact values —
  // so the FIXTURE is engineered to sit on the codec's exact points
  // (the lossy-format twin of the q192 LZW / q196 zlib trick):
  // payload byte pair (b1, b2) becomes one 8x8 luma block holding
  // only DC = v-128 (v = 8 + b1 % 240) and the (4,4) AC coefficient
  // d = b2 % 8, both at quantizer step 8. (4,4) is the one basis
  // function whose 2-D sample values are RATIONAL (cos((2x+1)pi/4) *
  // cos((2y+1)pi/4) = +-1/2), so the decoded block is EXACTLY
  // v + d*s(x)*s(y) with s = (+,-,-,+,+,-,-,+) — integer pixels, no
  // clamping (v in [8,247], d in [0,7]), recoverable from the raw
  // bytes in closed form by any engine. Chroma blocks are neutral
  // (DC 0 -> Cb = Cr = 128 exactly), so YCbCr->RGB must run and must
  // yield R = G = B = Y exactly; a decoder that misreads the chroma
  // path moves two channel means at once. The entropy stream still
  // exercises the real machinery: DC categories up to 8 bits, the
  // 38-zero run to zigzag position 39 needs two ZRL codes, and every
  // block ends in EOB. Reference: the reference engine ingests
  // payloads as opaque typed columns the same way
  // (test/sql/vector.01-insert-scan.slt fixtures); the decode tier is
  // this repo's training-data-pipeline scale extension.
  // ------------------------------------------------------------------

  /** Natural-order index for each zigzag position (T.81 figure A.6). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table (T.81 Annex C): one BITS/HUFFVAL pair
    * builds both the encoder's symbol->(code,len) map and the
    * decoder's minCode/maxCode/valPtr arrays. */
  private final class JpegHuff(val bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    private val codeOf = new Array[Int](256)
    private val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        var i = 0
        while (i < bits(len - 1)) {
          codeOf(vals(k)) = code
          lenOf(vals(k)) = len
          code += 1; k += 1; i += 1
        }
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
    }
    def code(sym: Int): (Int, Int) = {
      require(lenOf(sym) > 0, s"symbol $sym not in table")
      (codeOf(sym), lenOf(sym))
    }
  }

  // the standard tables of T.81 Annex K (K.3.1/K.3.2) — carried in
  // DHT by the fixture and rebuilt canonically by the decoder
  private val DcLum = new JpegHuff(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val DcChrom = new JpegHuff(
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val AcLum = new JpegHuff(
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
      0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
      0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
      0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
      0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
      0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
      0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
      0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa))
  private val AcChrom = new JpegHuff(
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
      0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
      0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
      0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
      0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
      0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
      0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
      0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
      0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
      0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
      0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
      0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
      0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
      0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa))

  /** MSB-first bit accumulator with the spec's 0xFF byte stuffing;
    * final partial byte padded with 1-bits (T.81 F.1.2.3). */
  private final class JpegBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      while (n != 0) put(1, 1)
      out.toByteArray
    }
  }

  private def jpegCategory(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** JPEG fixture encoder: a real baseline JFIF-style stream (SOI,
    * DQT all-8s, SOF0 8x(8*nb) 3-component 4:4:4, the four Annex K
    * DHTs, SOS, entropy-coded MCUs, EOI). Payload byte pair
    * (b[2i], b[2i+1]) -> MCU i: luma DC v-128 with v = 8 + b1 % 240,
    * luma AC(4,4) = b2 % 8, neutral chroma. Trailing odd byte dropped
    * (len/2 full pairs, the WAV `len // 2` convention). */
  private[graft] def encodeJpeg(bytes: Array[Byte]): Array[Byte] = {
    val nb = bytes.length / 2
    require(nb >= 1, "encodeJpeg needs at least one byte pair")
    require(nb <= 8191, s"fixture strip height 8*$nb exceeds u16")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT: table 0, all entries 8
    u16(2 + 1 + 64)
    u8(0x00)
    (0 until 64).foreach(_ => u8(8))
    marker(0xc0) // SOF0: 8-bit, height 8*nb, width 8, 3 comps 4:4:4
    u16(8 + 3 * 3)
    u8(8); u16(8 * nb); u16(8); u8(3)
    Seq(1, 2, 3).foreach { id => u8(id); u8(0x11); u8(0) }
    def dht(tcTh: Int, t: JpegHuff): Unit = {
      marker(0xc4)
      u16(2 + 1 + 16 + t.vals.length)
      u8(tcTh)
      t.bits.foreach(u8)
      t.vals.foreach(u8)
    }
    dht(0x00, DcLum); dht(0x10, AcLum)
    dht(0x01, DcChrom); dht(0x11, AcChrom)
    marker(0xda) // SOS
    u16(6 + 2 * 3)
    u8(3)
    u8(1); u8(0x00) // Y: DC0/AC0
    u8(2); u8(0x11) // Cb: DC1/AC1
    u8(3); u8(0x11) // Cr: DC1/AC1
    u8(0); u8(63); u8(0) // Ss, Se, AhAl
    val bw = new JpegBitWriter
    def putVal(t: JpegHuff, sym: Int): Unit = {
      val (c, l) = t.code(sym)
      bw.put(c, l)
    }
    def putBits(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
    var predY = 0
    var i = 0
    while (i < nb) {
      val v = 8 + ((bytes(2 * i) & 0xff) % 240)
      val d = (bytes(2 * i + 1) & 0xff) % 8
      // Y block: DC diff, then the 38-zero run to zigzag pos 39
      val diff = (v - 128) - predY
      predY = v - 128
      val s = jpegCategory(diff)
      putVal(DcLum, s); putBits(diff, s)
      if (d > 0) {
        putVal(AcLum, 0xf0) // ZRL x2: 32 of the 38 zeros
        putVal(AcLum, 0xf0)
        val ds = jpegCategory(d)
        putVal(AcLum, (6 << 4) | ds) // run 6 + the coefficient
        putBits(d, ds)
      }
      putVal(AcLum, 0x00) // EOB
      // neutral chroma: DC diff 0 (category 0), EOB
      putVal(DcChrom, 0); putVal(AcChrom, 0x00)
      putVal(DcChrom, 0); putVal(AcChrom, 0x00)
      i += 1
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Entropy-segment bit reader: MSB-first, unstuffs 0xFF 0x00, fails
    * loudly on any true marker inside the coded data. */
  private final class JpegBitReader(bytes: Array[Byte], var p: Int,
      fail: String => Nothing) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (p >= bytes.length) fail("entropy stream truncated")
        val b = bytes(p) & 0xff
        p += 1
        if (b == 0xff) {
          if (p >= bytes.length) fail("entropy stream truncated at ff")
          val m = bytes(p) & 0xff
          if (m == 0x00) p += 1
          else fail(f"marker ff$m%02x inside entropy data")
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: JpegHuff): Int = {
      var len = 1
      var code = bit()
      while (len <= 16 && code > t.maxCode(len)) {
        code = (code << 1) | bit()
        len += 1
      }
      if (len > 16) fail("invalid huffman code")
      t.vals(t.valPtr(len) + code - t.minCode(len))
    }
  }

  private def jpegExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // IDCT basis: cos((2x+1)*u*pi/16), scaled by C(u)/2 per 1-D pass
  private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Separable 2-D IDCT (T.81 A.3.3) + level shift + clamp. `coef` is
    * natural order (row v, col u); returns 64 pixels row-major. */
  private def jpegIdct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var col = 0
    while (col < 8) { // 1-D over the vertical frequency v
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val f = coef(v * 8 + col)
          if (f != 0) s += IdctCos(y)(v) * f
          v += 1
        }
        tmp(y * 8 + col) = s
        y += 1
      }
      col += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) { // 1-D over the horizontal frequency u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += IdctCos(x)(u) * tmp(y * 8 + u)
          u += 1
        }
        val px = Math.round(s).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL baseline JPEG decode per the published T.81 spec: marker
    * walk, DQT/DHT/SOF0/SOS parse, canonical Huffman rebuild, entropy
    * decode (DC diff + AC run-length/ZRL/EOB, byte unstuffing),
    * zigzag, dequantize, IDCT, level shift, MCU-interleaved block
    * placement (T.81 A.2.3), nearest-neighbor chroma upsample,
    * YCbCr->RGB. Supports 8-bit sequential baseline, 1 or 3
    * components, sampling all-1×1 (4:4:4 / gray) or 2×2,1×1,1×1
    * (4:2:0); everything else fails loudly. Returns (w, h, rgb
    * row-major, 3 bytes per pixel). */
  private[graft] def decodeJpegRaster(docId: Long, bytes: Array[Byte])
      : (Int, Int, Array[Byte]) = {
    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"jpeg decode [$docId]: $why")
    val failF: String => Nothing = fail
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) fail("missing SOI")
    var p = 2
    def u8(): Int = {
      if (p >= bytes.length) fail("truncated")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[JpegHuff](4)
    val acT = new Array[JpegHuff](4)
    var w = -1
    var h = -1
    var nComp = 0
    // per component: (id, qtable, dcTable, acTable, sampling h×v)
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    val compId = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    var planes: Array[Array[Int]] = null
    var sampH: Array[Int] = null
    var sampV: Array[Int] = null
    var sampHmax = 1
    var sampVmax = 1
    var sampMcX = 0
    var scanDone = false
    var done = false
    while (!done) {
      var m = u8()
      if (m != 0xff) fail(f"expected marker, got $m%02x")
      m = u8()
      while (m == 0xff) m = u8() // optional fill bytes
      m match {
        case 0xd9 => // EOI
          if (!scanDone) fail("EOI before scan")
          done = true
        case 0xdb => // DQT
          val segLen = u16(); val end = p + segLen - 2
          while (p < end) {
            val pqTq = u8()
            if ((pqTq >> 4) != 0) fail("16-bit quant table unsupported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(ZigZag(i)) = u8(); i += 1 }
            qt(pqTq & 0x0f) = t
          }
          if (p != end) fail("DQT length mismatch")
        case 0xc4 => // DHT
          val segLen = u16(); val end = p + segLen - 2
          while (p < end) {
            val tcTh = u8()
            val bits = Array.fill(16)(u8())
            val nv = bits.sum
            if (p + nv > end) fail("DHT truncated")
            val vals = Array.fill(nv)(u8())
            val t = new JpegHuff(bits, vals)
            if ((tcTh >> 4) == 0) dcT(tcTh & 0x0f) = t
            else acT(tcTh & 0x0f) = t
          }
          if (p != end) fail("DHT length mismatch")
        case 0xc0 => // SOF0: baseline sequential
          val segLen = u16(); val end = p + segLen - 2
          if (u8() != 8) fail("precision != 8")
          h = u16(); w = u16()
          nComp = u8()
          if (nComp != 1 && nComp != 3) fail(s"$nComp components")
          if (w <= 0 || h <= 0) fail(s"bad dims ${w}x$h")
          var c = 0
          while (c < nComp) {
            compId(c) = u8()
            val hv = u8()
            compH(c) = hv >> 4
            compV(c) = hv & 0x0f
            compQ(c) = u8()
            c += 1
          }
          // supported layouts: all-1×1 (4:4:4 / grayscale) or the
          // 2×2,1×1,1×1 three-component 4:2:0 every camera emits
          val all11 = (0 until nComp).forall(c =>
            compH(c) == 1 && compV(c) == 1)
          val is420 = nComp == 3 && compH(0) == 2 && compV(0) == 2 &&
            compH(1) == 1 && compV(1) == 1 &&
            compH(2) == 1 && compV(2) == 1
          if (!all11 && !is420)
            fail("subsampling unsupported (4:4:4 or 4:2:0 only)")
          if (p != end) fail("SOF0 length mismatch")
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          fail(f"non-baseline SOF ff$m%02x unsupported")
        case 0xdd => fail("restart intervals unsupported")
        case 0xda => // SOS + entropy-coded data
          if (w < 0) fail("SOS before SOF0")
          if (scanDone) fail("second scan unsupported")
          val segLen = u16(); val end = p + segLen - 2
          val ns = u8()
          if (ns != nComp) fail("partial scan unsupported")
          var c = 0
          while (c < ns) {
            val id = u8()
            val k = compId.indexOf(id)
            if (k < 0 || k >= nComp) fail(s"scan component $id unknown")
            val tt = u8()
            compDc(k) = tt >> 4
            compAc(k) = tt & 0x0f
            c += 1
          }
          if (u8() != 0) fail("spectral start != 0")
          if (u8() != 63) fail("spectral end != 63")
          if (u8() != 0) fail("successive approximation unsupported")
          if (p != end) fail("SOS length mismatch")
          // MCU geometry: hmax×vmax 8-px blocks per MCU; each
          // component c contributes compH(c)×compV(c) blocks per MCU
          // into its OWN plane at its own resolution (T.81 A.2.3) —
          // with all factors 1 this is exactly the per-tile
          // interleave of the 4:4:4 path
          var hmax = 1; var vmax = 1
          var ci = 0
          while (ci < nComp) {
            if (compH(ci) > hmax) hmax = compH(ci)
            if (compV(ci) > vmax) vmax = compV(ci)
            ci += 1
          }
          val mcX = (w + 8 * hmax - 1) / (8 * hmax)
          val mcY = (h + 8 * vmax - 1) / (8 * vmax)
          planes = Array.tabulate(nComp)(c =>
            new Array[Int](mcX * 8 * compH(c) * mcY * 8 * compV(c)))
          val br = new JpegBitReader(bytes, p, failF)
          val pred = new Array[Int](nComp)
          val coef = new Array[Int](64)
          var my = 0
          while (my < mcY) {
            var mx = 0
            while (mx < mcX) {
              var c = 0
              while (c < nComp) {
                val q = qt(compQ(c))
                if (q == null) fail(s"quant table ${compQ(c)} undefined")
                val dc = dcT(compDc(c))
                val ac = acT(compAc(c))
                if (dc == null || ac == null) fail("huffman table undefined")
                val pw = mcX * 8 * compH(c)
                var bv = 0
                while (bv < compV(c)) {
                  var bu = 0
                  while (bu < compH(c)) {
                    java.util.Arrays.fill(coef, 0)
                    val s = br.decode(dc)
                    if (s > 11) fail(s"DC category $s")
                    pred(c) += jpegExtend(br.receive(s), s)
                    coef(0) = pred(c) * q(0)
                    var k = 1
                    var eob = false
                    while (!eob && k <= 63) {
                      val rs = br.decode(ac)
                      val r = rs >> 4
                      val sz = rs & 0x0f
                      if (sz == 0) {
                        if (r == 15) k += 16 // ZRL
                        else eob = true
                      } else {
                        k += r
                        if (k > 63) fail("AC run past block end")
                        val nat = ZigZag(k)
                        coef(nat) = jpegExtend(br.receive(sz), sz) * q(nat)
                        k += 1
                      }
                    }
                    val px = jpegIdct(coef)
                    val plane = planes(c)
                    val oy = (my * compV(c) + bv) * 8
                    val ox = (mx * compH(c) + bu) * 8
                    var yy = 0
                    while (yy < 8) {
                      var xx = 0
                      while (xx < 8) {
                        plane((oy + yy) * pw + ox + xx) =
                          px(yy * 8 + xx)
                        xx += 1
                      }
                      yy += 1
                    }
                    bu += 1
                  }
                  bv += 1
                }
                c += 1
              }
              mx += 1
            }
            my += 1
          }
          // stash geometry for the raster assembly below
          sampH = java.util.Arrays.copyOf(compH, nComp)
          sampV = java.util.Arrays.copyOf(compV, nComp)
          sampHmax = hmax; sampVmax = vmax; sampMcX = mcX
          p = br.p
          scanDone = true
        case a if a >= 0xe0 && a <= 0xef => p += u16() - 2 // APPn
        case 0xfe => p += u16() - 2 // COM
        case other => fail(f"unsupported marker ff$other%02x")
      }
    }
    if (p != bytes.length) fail("trailing bytes after EOI")
    if (!scanDone) fail("no scan")
    val rgb = new Array[Byte](w * h * 3)
    def clamp(v: Double): Int = {
      val r = Math.round(v).toInt
      if (r < 0) 0 else if (r > 255) 255 else r
    }
    // per-component nearest-neighbor sample at the component's own
    // resolution — the T.81 A.2 upsample; with all factors 1 this is
    // the identity addressing of the 4:4:4 path
    def sample(c: Int, y: Int, x: Int): Int = {
      val pw = sampMcX * 8 * sampH(c)
      planes(c)((y * sampV(c) / sampVmax) * pw + x * sampH(c) / sampHmax)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (nComp == 1) {
          val g = sample(0, y, x)
          rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
        } else {
          val yv = sample(0, y, x)
          val cb = sample(1, y, x) - 128
          val cr = sample(2, y, x) - 128
          rgb(o) = clamp(yv + 1.402 * cr).toByte
          rgb(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
          rgb(o + 2) = clamp(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  final case class JpegDecoded(doc_id: Long, width: Int, height: Int,
      n_blocks: Long, n_pixels: Long, mean_r: Double, mean_g: Double,
      mean_b: Double, mean_amp: Double, top_left_r: Int,
      dc_checksum: Long)

  /** Features over the decoded RGB raster: per-channel means, the
    * mean per-8x8-block amplitude ((max R - min R) / 2 — the AC term
    * the fixture plants), the top-left red byte, and a positional
    * checksum of per-block mean luma (exact integers by fixture
    * construction). Blocks in row-major tile order. */
  private[graft] def decodeJpeg(docId: Long, bytes: Array[Byte])
      : JpegDecoded = {
    val (w, h, rgb) = decodeJpegRaster(docId, bytes)
    if (w % 8 != 0 || h % 8 != 0)
      throw new IllegalArgumentException(
        s"jpeg decode [$docId]: dims ${w}x$h not block-aligned")
    val nbx = w / 8
    val nby = h / 8
    val nb = nbx.toLong * nby
    var sr = 0L; var sg = 0L; var sb = 0L
    var ampSum = 0L
    var dcSum = 0L
    var bi = 0
    while (bi < nb) {
      val bx = (bi % nbx).toInt
      val by = (bi / nbx).toInt
      var mx = Int.MinValue
      var mn = Int.MaxValue
      var blockR = 0L
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val o = ((by * 8 + yy) * w + bx * 8 + xx) * 3
          val r = rgb(o) & 0xff
          sr += r; sg += rgb(o + 1) & 0xff; sb += rgb(o + 2) & 0xff
          blockR += r
          if (r > mx) mx = r
          if (r < mn) mn = r
          xx += 1
        }
        yy += 1
      }
      ampSum += (mx - mn)
      dcSum += (bi + 1) * (blockR / 64)
      bi += 1
    }
    val np = w.toLong * h
    JpegDecoded(docId, w, h, nb, np,
      sr.toDouble / np, sg.toDouble / np, sb.toDouble / np,
      ampSum.toDouble / 2.0 / nb, rgb(0) & 0xff, dcSum)
  }

  /** 4:2:0 JPEG fixture encoder — the chroma-subsampled layout
    * virtually every camera and web JPEG uses: SOF0 sampling 2×2 for
    * Y and 1×1 for Cb/Cr, so each 16×16 MCU interleaves FOUR luma
    * blocks (TL,TR,BL,BR) and one block per chroma plane. Payload
    * byte 5-tuple (b0..b3, b4) -> MCU i: quadrant lumas
    * 36 + b_q % 184 (flat DC-only blocks), Cb = 108 + b4 % 41 (flat,
    * ±20 around neutral — ranges chosen so YCbCr→RGB never clamps),
    * Cr neutral. Frame is one MCU wide (16 × 16·nm); trailing bytes
    * short of a 5-tuple are dropped. */
  private[graft] def encodeJpeg420(bytes: Array[Byte]): Array[Byte] = {
    val nm = bytes.length / 5
    require(nm >= 1, "encodeJpeg420 needs at least one 5-tuple")
    require(nm <= 4095, s"fixture strip height 16*$nm exceeds u16")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT: table 0, all entries 8
    u16(2 + 1 + 64)
    u8(0x00)
    (0 until 64).foreach(_ => u8(8))
    marker(0xc0) // SOF0: 8-bit, 16·nm × 16, Y 2×2 + chroma 1×1
    u16(8 + 3 * 3)
    u8(8); u16(16 * nm); u16(16); u8(3)
    u8(1); u8(0x22); u8(0) // Y
    u8(2); u8(0x11); u8(0) // Cb
    u8(3); u8(0x11); u8(0) // Cr
    def dht(tcTh: Int, t: JpegHuff): Unit = {
      marker(0xc4)
      u16(2 + 1 + 16 + t.vals.length)
      u8(tcTh)
      t.bits.foreach(u8)
      t.vals.foreach(u8)
    }
    dht(0x00, DcLum); dht(0x10, AcLum)
    dht(0x01, DcChrom); dht(0x11, AcChrom)
    marker(0xda) // SOS
    u16(6 + 2 * 3)
    u8(3)
    u8(1); u8(0x00)
    u8(2); u8(0x11)
    u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    val bw = new JpegBitWriter
    def putVal(t: JpegHuff, sym: Int): Unit = {
      val (c, l) = t.code(sym)
      bw.put(c, l)
    }
    def putBits(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
    def dcOnly(dct: JpegHuff, act: JpegHuff, diff: Int): Unit = {
      val s = jpegCategory(diff)
      putVal(dct, s); putBits(diff, s)
      putVal(act, 0x00) // EOB — flat block
    }
    var predY = 0
    var predCb = 0
    var i = 0
    while (i < nm) {
      var q = 0
      while (q < 4) { // TL, TR, BL, BR — T.81 block raster order
        val v = 36 + ((bytes(5 * i + q) & 0xff) % 184)
        dcOnly(DcLum, AcLum, (v - 128) - predY)
        predY = v - 128
        q += 1
      }
      val cb = 108 + ((bytes(5 * i + 4) & 0xff) % 41)
      dcOnly(DcChrom, AcChrom, (cb - 128) - predCb)
      predCb = cb - 128
      dcOnly(DcChrom, AcChrom, 0) // Cr stays neutral
      i += 1
    }
    out.write(bw.finish())
    marker(0xd9) // EOI
    out.toByteArray
  }

  final case class Jpeg420Decoded(doc_id: Long, width: Int,
      height: Int, n_mcus: Long, n_pixels: Long, mean_y_tl: Double,
      mean_y_tr: Double, mean_y_bl: Double, mean_y_br: Double,
      db_mean: Double, dg_mean: Double, top_left_r: Int)

  /** Features over the decoded 4:2:0 RGB raster, all end-to-end
    * through the general MCU decode + upsample: per-quadrant luma
    * means (Cr is neutral so R == Y exactly — a decoder that swaps
    * the four luma blocks inside the MCU moves a quadrant mean), and
    * the raster means of B−R and G−R, which for integer Y equal
    * round(1.772·cbOff) / round(−0.344136·cbOff) per pixel — the
    * chroma path and the upsample alignment in one number each
    * (TextSpec-style domain sweep proves no ±0.5 rounding boundary
    * exists, so the oracle's round() agrees engine-for-engine). */
  private[graft] def decodeJpeg420(docId: Long, bytes: Array[Byte])
      : Jpeg420Decoded = {
    val (w, h, rgb) = decodeJpegRaster(docId, bytes)
    if (w != 16 || h % 16 != 0)
      throw new IllegalArgumentException(
        s"jpeg420 decode [$docId]: dims ${w}x$h not MCU-aligned")
    val nm = (h / 16).toLong
    val qs = new Array[Long](4)
    var dbSum = 0L
    var dgSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val r = rgb(o) & 0xff
        qs(((y % 16) / 8) * 2 + x / 8) += r
        dgSum += (rgb(o + 1) & 0xff) - r
        dbSum += (rgb(o + 2) & 0xff) - r
        x += 1
      }
      y += 1
    }
    val np = w.toLong * h
    val qpix = 64L * nm // pixels per quadrant position
    Jpeg420Decoded(docId, w, h, nm, np,
      qs(0).toDouble / qpix, qs(1).toDouble / qpix,
      qs(2).toDouble / qpix, qs(3).toDouble / qpix,
      dbSum.toDouble / np, dgSum.toDouble / np, rgb(0) & 0xff)
  }

  /** q267's pipeline: same typed mapPartitions shape as q251; short
    * payloads yield the zero row. */
  def decodeImagesJpeg420(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        if (b.length < 5)
          Jpeg420Decoded(id, 0, 0, 0L, 0L, 0.0, 0.0, 0.0, 0.0,
            0.0, 0.0, 0)
        else decodeJpeg420(id, encodeJpeg420(b))
      })
      .toDF()
  }

  /** q255's pipeline: Adam7-interlaced PNG — identical features to
    * q196 (the final raster IS the payload either way); what changes
    * is the whole reconstruction path: 7 sub-image passes, pass-local
    * filtering, and the pigeon-grid scatter. */
  def decodeImagesPngAdam7(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodePng(id, encodePngAdam7(b)) })
      .toDF()
  }

  // ------------------------------------------------------------------
  // POSIX ustar tar shards — the WebDataset layout: large multimodal
  // training corpora ship as tar shards of ~N samples each, read
  // sequentially per shard. Encode (shard assembly) is the fixture;
  // decode is the product: a real ustar parser — 512-byte headers,
  // NUL-terminated octal size fields, the checksum computed with the
  // checksum field itself read as spaces, "ustar" magic, content
  // padded to block boundaries, two zero blocks as the terminator.
  // ------------------------------------------------------------------

  /** Shard assembler: members (sorted by id) as `doc<id>.txt` regular
    * files in one POSIX ustar stream. */
  private[graft] def encodeTarShard(members: Seq[(Long, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.sortBy(_._1).foreach { case (id, data) =>
      val hdr = new Array[Byte](512)
      def put(s: String, off: Int): Unit = {
        val b = s.getBytes("US-ASCII")
        System.arraycopy(b, 0, hdr, off, b.length)
      }
      put(s"doc$id.txt", 0) // name[100]
      put("0000644", 100) // mode[8], NUL-terminated octal
      put("0000000", 108) // uid[8]
      put("0000000", 116) // gid[8]
      put(f"${data.length}%011o", 124) // size[12]
      put("00000000000", 136) // mtime[12]
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum spaces
      hdr(156) = '0' // typeflag: regular file
      put("ustar", 257) // magic[6] = "ustar\0"
      put("00", 263) // version[2]
      val sum = hdr.map(_ & 0xff).sum
      put(f"$sum%06o", 148) // chksum = 6 octal digits, NUL, space
      hdr(154) = 0
      hdr(155) = ' '
      out.write(hdr)
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    out.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
    out.toByteArray
  }

  /** REAL ustar decode: per member (doc_id parsed from the name,
    * content bytes, unsigned byte sum). Fails loudly on a bad
    * checksum, missing magic, non-octal size, truncation, an
    * unexpected member name, or trailing garbage. */
  private[graft] def decodeTarShard(shardId: Long, bytes: Array[Byte])
      : Seq[(Long, Int, Long)] = {
    def fail(why: String): Nothing =
      throw new IllegalArgumentException(s"tar decode [$shardId]: $why")
    if (bytes.length % 512 != 0) fail("not block-aligned")
    val outRows = scala.collection.mutable.ListBuffer.empty[(Long, Int, Long)]
    var p = 0
    var done = false
    while (!done) {
      if (p + 512 > bytes.length) fail("missing end-of-archive blocks")
      if ((p until p + 512).forall(bytes(_) == 0)) {
        // terminator: a second zero block, then only zero padding
        if (p + 1024 > bytes.length ||
            (p + 512 until p + 1024).exists(bytes(_) != 0))
          fail("single zero block is not a terminator")
        if ((p + 1024 until bytes.length).exists(bytes(_) != 0))
          fail("trailing bytes after end-of-archive")
        done = true
      } else {
        def cstr(off: Int, len: Int): String = {
          var e = off
          while (e < off + len && bytes(p + e) != 0) e += 1
          new String(bytes, p + off, e - off, "US-ASCII")
        }
        def octal(off: Int, len: Int): Long = {
          val s = cstr(off, len).trim
          if (s.isEmpty || !s.forall(c => c >= '0' && c <= '7'))
            fail(s"bad octal field at $off: '$s'")
          java.lang.Long.parseLong(s, 8)
        }
        if (cstr(257, 6) != "ustar") fail("missing ustar magic")
        // checksum: header bytes summed with the chksum field as spaces
        var sum = 0
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt
            else bytes(p + i) & 0xff)
          i += 1
        }
        if (octal(148, 8) != sum) fail("header checksum mismatch")
        val tf = bytes(p + 156)
        if (tf != '0'.toByte && tf != 0) fail(s"unsupported typeflag $tf")
        val name = cstr(0, 100)
        val m = "^doc(\\d+)\\.txt$".r.findFirstMatchIn(name)
          .getOrElse(fail(s"unexpected member name '$name'"))
        val size = octal(124, 12)
        if (size > Int.MaxValue) fail("member too large")
        val blocks = ((size + 511) / 512).toInt
        if (p + 512 + blocks * 512 > bytes.length)
          fail(s"member '$name' truncated")
        var bs = 0L
        var j = 0
        while (j < size) {
          bs += bytes(p + 512 + j) & 0xff
          j += 1
        }
        outRows += ((m.group(1).toLong, size.toInt, bs))
        p += 512 + blocks * 512
      }
    }
    outRows.toList
  }

  private[graft] final case class WarcResponse(docId: Long,
      targetUri: String, status: Int, recordBytes: Long,
      bodyBytes: Long, bodyChecksum: Long)

  /** WARC/1.0 fixture encoder (ISO 28500, the web-crawl container
    * every CommonCrawl-scale corpus arrives in): one `warcinfo`
    * record, then one `response` record per member whose block is a
    * real HTTP/1.1 message (status line + Content-Length header +
    * blank line + body = the member's text bytes). Every record is
    * `WARC/1.0 CRLF headers CRLF CRLF block CRLF CRLF` with an exact
    * Content-Length — the oracle recomputes each record's byte size
    * closed-form from the doc id and body length. */
  private[graft] def encodeWarcInfoRecord(shard: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val info = "software: graft\r\n" // 17 bytes
    w("WARC/1.0\r\n")
    w("WARC-Type: warcinfo\r\n")
    w(s"WARC-Record-ID: <urn:graft:shard-$shard>\r\n")
    w("Content-Type: application/warc-fields\r\n")
    w(s"Content-Length: ${info.length}\r\n\r\n")
    w(info); w("\r\n\r\n")
    out.toByteArray
  }

  private[graft] def encodeWarcResponseRecord(id: Long,
      body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val http = s"HTTP/1.1 200 OK\r\nContent-Length: ${body.length}" +
      "\r\n\r\n"
    val cl = http.length + body.length
    w("WARC/1.0\r\n")
    w("WARC-Type: response\r\n")
    w(s"WARC-Target-URI: https://example.com/doc/$id\r\n")
    w(s"WARC-Record-ID: <urn:graft:doc-$id>\r\n")
    w("Content-Type: application/http; msgtype=response\r\n")
    w(s"Content-Length: $cl\r\n\r\n")
    w(http); out.write(body); w("\r\n\r\n")
    out.toByteArray
  }

  private[graft] def encodeWarcShard(shard: Long,
      members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(encodeWarcInfoRecord(shard))
    members.foreach { case (id, body) =>
      out.write(encodeWarcResponseRecord(id, body))
    }
    out.toByteArray
  }

  /** REAL WARC/1.0 record walk — strict parser per ISO 28500: version
    * line, CRLF-terminated `Name: value` headers (bare LF is a
    * format violation and THROWS), block skipped by the declared
    * Content-Length, the mandatory CRLF CRLF record trailer verified
    * byte-for-byte. `response` blocks parse one level deeper as
    * HTTP/1.1 (status line, headers, blank line, body), the HTTP
    * Content-Length cross-checked against the actual body extent —
    * a walker that is even one CRLF off mis-frames every subsequent
    * record and fails loudly instead of shearing bodies silently.
    * Returns (total record count, per-response rows). */
  private[graft] def decodeWarcShard(shard: Long, bytes: Array[Byte])
      : (Int, Seq[WarcResponse]) = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"warc decode [shard $shard]: $why")
    var pos = 0
    def readLine(end: Int): String = {
      val start = pos
      while (pos + 1 < end &&
          !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) {
        if (bytes(pos) == '\n') fail(s"bare LF at $pos")
        pos += 1
      }
      if (pos + 1 >= end) fail("truncated line")
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 2
      s
    }
    def readHeaders(end: Int): Map[String, String] = {
      var hs = Map.empty[String, String]
      var line = readLine(end)
      while (line.nonEmpty) {
        val i = line.indexOf(": ")
        if (i <= 0) fail(s"malformed header '$line'")
        hs += line.substring(0, i) -> line.substring(i + 2)
        line = readLine(end)
      }
      hs
    }
    val out = Seq.newBuilder[WarcResponse]
    var n = 0
    while (pos < bytes.length) {
      val recStart = pos
      if (readLine(bytes.length) != "WARC/1.0")
        fail(s"bad version line at $recStart")
      val hs = readHeaders(bytes.length)
      val cl = hs.getOrElse("Content-Length",
        fail("missing Content-Length")).toLong
      val typ = hs.getOrElse("WARC-Type", fail("missing WARC-Type"))
      if (pos + cl + 4 > bytes.length) fail(s"block truncated at $pos")
      val blockEnd = pos + cl.toInt
      if (typ == "response") {
        val rid = hs.getOrElse("WARC-Record-ID",
          fail("missing record id"))
        if (!rid.startsWith("<urn:graft:doc-") || !rid.endsWith(">"))
          fail(s"unexpected record id '$rid'")
        val docId = rid.substring(15, rid.length - 1).toLong
        val uri = hs.getOrElse("WARC-Target-URI",
          fail("missing target URI"))
        val statusLine = readLine(blockEnd)
        val parts = statusLine.split(' ')
        if (parts.length < 3 || !parts(0).startsWith("HTTP/1."))
          fail(s"bad HTTP status line '$statusLine'")
        val status = parts(1).toInt
        val httpHs = readHeaders(blockEnd)
        val bodyBytes = blockEnd - pos
        val declared = httpHs.getOrElse("Content-Length",
          fail("missing HTTP Content-Length")).toLong
        if (declared != bodyBytes)
          fail(s"HTTP body $bodyBytes != declared $declared")
        var sum = 0L
        var i = pos
        while (i < blockEnd) {
          sum += (i - pos + 1).toLong * (bytes(i) & 0xff); i += 1
        }
        out += WarcResponse(docId, uri, status, cl, bodyBytes, sum)
      }
      pos = blockEnd
      if (pos + 4 > bytes.length ||
          !(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
            bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n'))
        fail(s"missing record trailer at $pos")
      pos += 4
      n += 1
    }
    (n, out.result())
  }

  /** One RFC 1952 gzip member: fixed 10-byte header (CM 8, FLG 0,
    * OS 255), raw-deflate body, CRC32 + ISIZE trailer. Real deflate
    * via java.util.zip — the wire bytes are genuinely compressed. */
  private[graft] def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte))
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    val crc = new java.util.zip.CRC32
    crc.update(data)
    def u32le(x: Long): Unit = {
      out.write((x & 0xff).toInt); out.write(((x >> 8) & 0xff).toInt)
      out.write(((x >> 16) & 0xff).toInt)
      out.write(((x >> 24) & 0xff).toInt)
    }
    u32le(crc.getValue); u32le(data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** REAL multi-member gzip walk per RFC 1952 — the mechanism that
    * makes .warc.gz randomly accessible (each record its own member,
    * so a reader can start at any member boundary): per member, the
    * header is validated (magic, CM 8, FLG 0), the raw-deflate body
    * inflated to exactly its end (Inflater#getRemaining pins the
    * boundary), and the CRC32 + ISIZE trailer verified against the
    * inflated bytes — a walker that mis-finds a boundary or corrupts
    * a byte fails the member's CRC loudly instead of shearing every
    * member after it. */
  /** Parse ONE gzip member starting at `at`; returns (inflated data,
    * end offset). Throws on any malformation — header, deflate
    * stream, CRC32, or ISIZE. */
  private[graft] def parseGzipMember(shard: Long, bytes: Array[Byte],
      at: Int): (Array[Byte], Int) = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"warc.gz decode [shard $shard]: $why")
    if (at + 10 > bytes.length) fail(s"truncated gzip header at $at")
    if ((bytes(at) & 0xff) != 0x1f || (bytes(at + 1) & 0xff) != 0x8b)
      fail(s"bad gzip magic at $at")
    if (bytes(at + 2) != 8) fail("unsupported compression method")
    val flg = bytes(at + 3) & 0xff
    if (flg != 0) fail(s"gzip FLG $flg unsupported")
    var pos = at + 10
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(bytes, pos, bytes.length - pos)
    val bo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case e: java.util.zip.DataFormatException =>
              fail(s"deflate error in member at $at: ${e.getMessage}")
          }
        if (n > 0) bo.write(buf, 0, n)
        else if (!inf.finished() && inf.needsInput())
          fail(s"deflate stream truncated in member at $at")
      }
      pos += (bytes.length - pos) - inf.getRemaining
    } finally inf.end()
    val data = bo.toByteArray
    if (pos + 8 > bytes.length) fail("gzip trailer truncated")
    def u32le(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    if (u32le(pos) != crc.getValue)
      fail(s"CRC mismatch in member at $at")
    if (u32le(pos + 4) != (data.length.toLong & 0xffffffffL))
      fail(s"ISIZE mismatch in member at $at")
    (data, pos + 8)
  }

  private[graft] def gunzipMembers(shard: Long, bytes: Array[Byte])
      : Seq[Array[Byte]] = {
    var pos = 0
    val out = Seq.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      val (data, end) = parseGzipMember(shard, bytes, pos)
      out += data
      pos = end
    }
    out.result()
  }

  /** PERMISSIVE-mode member walk — the quarantine semantics a
    * production crawl reader needs next to the fail-loud one: a
    * member that fails ANY check is counted quarantined (never
    * partially emitted), and the walk resyncs by scanning for the
    * next gzip magic (1F 8B 08 00) — possible precisely BECAUSE
    * .warc.gz gives every record its own member; one bad record
    * costs one record, not the shard. Returns (good members,
    * quarantined count). */
  private[graft] def gunzipMembersPermissive(shard: Long,
      bytes: Array[Byte]): (Seq[Array[Byte]], Int) = {
    var pos = 0
    var quarantined = 0
    val good = Seq.newBuilder[Array[Byte]]
    def magicAt(q: Int): Boolean =
      q + 4 <= bytes.length && (bytes(q) & 0xff) == 0x1f &&
        (bytes(q + 1) & 0xff) == 0x8b && bytes(q + 2) == 8 &&
        bytes(q + 3) == 0
    while (pos < bytes.length) {
      val parsed =
        try Some(parseGzipMember(shard, bytes, pos))
        catch { case _: IllegalArgumentException => None }
      parsed match {
        case Some((data, end)) =>
          good += data
          pos = end
        case None =>
          quarantined += 1
          var q = pos + 1
          while (q < bytes.length && !magicAt(q)) q += 1
          pos = if (q < bytes.length) q else bytes.length
      }
    }
    (good.result(), quarantined)
  }

  /** q268's pipeline: gzipped WARC — q263's container with each
    * record wrapped as its OWN gzip member (the CommonCrawl .warc.gz
    * random-access convention). Decode walks member boundaries with
    * per-member CRC verification, re-frames the inflated stream as
    * WARC, and cross-checks one-record-per-member. */
  def decodeWarcGzShards(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(expr("doc_id div 16").as("shard_id"), col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val members = it.map(t => (t._2, t._3)).toSeq.sortBy(_._1)
        val gz = new java.io.ByteArrayOutputStream()
        gz.write(gzipMember(encodeWarcInfoRecord(shard)))
        members.foreach { case (id, b) =>
          gz.write(gzipMember(encodeWarcResponseRecord(id, b)))
        }
        val plains = gunzipMembers(shard, gz.toByteArray)
        val whole = plains.reduce(_ ++ _)
        val (nRec, resp) = decodeWarcShard(shard, whole)
        if (plains.size != nRec)
          throw new IllegalArgumentException(s"warc.gz [shard $shard]:" +
            s" ${plains.size} members != $nRec records")
        resp.map(r => (shard, r.docId, r.status, r.recordBytes,
          r.bodyBytes, r.bodyChecksum, plains.size.toLong,
          whole.length.toLong))
      }
      .toDF("shard_id", "doc_id", "http_status", "record_bytes",
        "body_bytes", "body_checksum", "n_members", "plain_bytes")
      .orderBy("doc_id")
  }

  /** q269's pipeline: permissive .warc.gz ingest — q268's shards
    * with a deterministic fraction of members CORRUPTED (one deflate
    * byte flipped in every doc_id % 7 == 3 response — the bit-rot /
    * truncated-upload case), read in quarantine mode: bad members
    * count, good members still parse as strict WARC, and the shard
    * report carries exactly the good-record mass the plant predicts.
    * The 100 TB point: one flipped byte costs ONE record, not the
    * file — and the reader says so instead of silently shearing. */
  def decodeWarcGzPermissive(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(expr("doc_id div 16").as("shard_id"), col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val members = it.map(t => (t._2, t._3)).toSeq.sortBy(_._1)
        val out = new java.io.ByteArrayOutputStream()
        out.write(gzipMember(encodeWarcInfoRecord(shard)))
        members.foreach { case (id, b) =>
          val m = gzipMember(encodeWarcResponseRecord(id, b))
          if (id % 7 == 3) m(14) = (m(14) ^ 0x55).toByte
          out.write(m)
        }
        val (good, quarantined) =
          gunzipMembersPermissive(shard, out.toByteArray)
        var nGood = 0L
        var bodySum = 0L
        var ckSum = 0L
        good.foreach { g =>
          val (n, resp) = decodeWarcShard(shard, g)
          nGood += n
          resp.foreach { r =>
            bodySum += r.bodyBytes; ckSum += r.bodyChecksum
          }
        }
        (shard, nGood, quarantined.toLong, bodySum, ckSum)
      }
      .toDF("shard_id", "n_good", "n_quarantined", "sum_body_bytes",
        "sum_body_checksum")
      .orderBy("shard_id")
  }

  final case class ExifDecoded(doc_id: Long, orientation: Int,
      datetime: String, exposure_num: Long, exposure_den: Long,
      pixel_x: Long, n_ifd0_tags: Int, n_exif_tags: Int)

  /** EXIF fixture encoder — a JPEG container whose APP1 segment
    * carries a real Exif block (the "Exif\0\0" signature followed by
    * a complete little-endian TIFF structure): IFD0 with Orientation
    * (SHORT), DateTime (ASCII ×20 — out-of-line, types beyond the
    * q262 subset), and the 0x8769 Exif-sub-IFD pointer; the sub-IFD
    * carries ExposureTime (RATIONAL — two u32 at an offset, the
    * value-or-offset rule again) and PixelXDimension (LONG). Values
    * derive from (doc_id, payload length) so every extracted field
    * is closed-form. A dummy quant table and EOI bracket the segment
    * so the walker exercises marker skipping. */
  private[graft] def encodeExif(docId: Long, n: Int): Array[Byte] = {
    val mm = (docId % 60).toInt
    val ss = (docId * 7 % 60).toInt
    val dt = f"2026:08:15 12:$mm%02d:$ss%02d" + "\u0000" // 20 bytes
    require(dt.length == 20)
    // TIFF block layout (offsets relative to the TIFF header):
    //   0: II*\0 + IFD0 offset (8)
    //   8: IFD0: count(2) + 3*12 + next(4) = 42 → ends at 50
    //  50: ExifIFD: count(2) + 2*12 + next(4) = 30 → ends at 80
    //  80: DateTime ASCII (20)
    // 100: ExposureTime RATIONAL (8)
    val tiff = java.nio.ByteBuffer.allocate(108)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      tiff.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3) { tiff.putShort(v.toShort); tiff.putShort(0) }
      else tiff.putInt(v)
    }
    tiff.putShort(3) // IFD0
    entry(0x0112, 3, 1, 1 + (docId % 8).toInt) // Orientation
    entry(0x0132, 2, 20, 80)                   // DateTime → offset
    entry(0x8769, 4, 1, 50)                    // Exif sub-IFD pointer
    tiff.putInt(0)
    tiff.putShort(2) // Exif sub-IFD
    entry(0x829a, 5, 1, 100)                   // ExposureTime RATIONAL
    entry(0xa002, 4, 1, n)                     // PixelXDimension
    tiff.putInt(0)
    tiff.put(dt.getBytes("US-ASCII"))
    tiff.putInt(1).putInt(1 + n % 1000)        // 1/(1+n%1000) s
    val exif = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff.array()
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    m(0xd8)                                     // SOI
    m(0xe1)                                     // APP1
    out.write((exif.length + 2) >> 8); out.write((exif.length + 2) & 0xff)
    out.write(exif)
    m(0xdb)                                     // a DQT to skip over
    out.write(0); out.write(67); out.write(0)
    (0 until 64).foreach(_ => out.write(8))
    m(0xd9)                                     // EOI
    out.toByteArray
  }

  /** REAL EXIF extraction — the metadata walk a multimodal pipeline
    * runs on every camera image before any pixel work: JPEG marker
    * walk to the APP1 segment, "Exif\0\0" signature check, then a
    * full TIFF parse INSIDE the segment (its own byte order, its own
    * offsets — all relative to the TIFF header, the classic EXIF
    * off-by-segment bug), ASCII and RATIONAL field types through the
    * value-or-offset rule, and the 0x8769 sub-IFD pointer hop.
    * Malformed segments throw. */
  private[graft] def decodeExif(docId: Long, bytes: Array[Byte])
      : ExifDecoded = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"exif decode [$docId]: $why")
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) fail("missing SOI")
    var p = 2
    var app1 = -1
    var app1Len = 0
    while (app1 < 0) {
      if (p + 4 > bytes.length) fail("no APP1 segment before EOF")
      if ((bytes(p) & 0xff) != 0xff) fail(f"expected marker at $p")
      val mk = bytes(p + 1) & 0xff
      if (mk == 0xd9) fail("no APP1 segment before EOI")
      val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      if (mk == 0xe1) { app1 = p + 4; app1Len = len - 2 }
      else p += 2 + len
    }
    if (app1 + app1Len > bytes.length) fail("APP1 overruns file")
    if (app1Len < 14 ||
        new String(bytes, app1, 6, "US-ASCII") != "Exif\u0000\u0000")
      fail("APP1 is not an Exif segment")
    val t0 = app1 + 6 // TIFF header — ALL offsets are relative here
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order((bytes(t0).toChar, bytes(t0 + 1).toChar) match {
      case ('I', 'I') => java.nio.ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => java.nio.ByteOrder.BIG_ENDIAN
      case _          => fail("bad TIFF byte-order mark in Exif")
    })
    if (bb.getShort(t0 + 2) != 42) fail("bad TIFF magic in Exif")
    def readIfd(off: Int): Map[Int, (Int, Int, Int)] = {
      val at = t0 + off
      if (at + 2 > app1 + app1Len) fail(s"IFD at $off overruns APP1")
      val n = bb.getShort(at) & 0xffff
      if (at + 2 + 12 * n + 4 > app1 + app1Len)
        fail(s"IFD at $off truncated")
      var tags = Map.empty[Int, (Int, Int, Int)]
      var prev = -1
      var i = 0
      while (i < n) {
        val e = at + 2 + 12 * i
        val tag = bb.getShort(e) & 0xffff
        if (tag <= prev) fail(s"IFD tags not ascending at $tag")
        prev = tag
        tags += tag ->
          ((bb.getShort(e + 2) & 0xffff, bb.getInt(e + 4), e + 8))
        i += 1
      }
      tags
    }
    def long(tags: Map[Int, (Int, Int, Int)], tag: Int): Long =
      tags.get(tag) match {
        case Some((3, 1, pos)) => (bb.getShort(pos) & 0xffff).toLong
        case Some((4, 1, pos)) => bb.getInt(pos).toLong & 0xffffffffL
        case Some((t, c, _))   => fail(s"tag $tag: bad type/count $t/$c")
        case None              => fail(s"missing tag $tag")
      }
    def ascii(tags: Map[Int, (Int, Int, Int)], tag: Int): String =
      tags.get(tag) match {
        case Some((2, cnt, pos)) =>
          val base = if (cnt <= 4) pos else t0 + bb.getInt(pos)
          if (base + cnt > app1 + app1Len) fail(s"tag $tag overruns")
          val s = new String(bytes, base, cnt, "US-ASCII")
          if (!s.endsWith("\u0000")) fail(s"tag $tag: unterminated ASCII")
          s.dropRight(1)
        case _ => fail(s"tag $tag: not ASCII")
      }
    def rational(tags: Map[Int, (Int, Int, Int)], tag: Int)
        : (Long, Long) = tags.get(tag) match {
      case Some((5, 1, pos)) => // always out-of-line: 8 > 4 bytes
        val base = t0 + bb.getInt(pos)
        if (base + 8 > app1 + app1Len) fail(s"tag $tag overruns")
        (bb.getInt(base).toLong & 0xffffffffL,
          bb.getInt(base + 4).toLong & 0xffffffffL)
      case _ => fail(s"tag $tag: not RATIONAL")
    }
    val ifd0 = readIfd(bb.getInt(t0 + 4))
    val exifIfd = readIfd(long(ifd0, 0x8769).toInt)
    val (en, ed) = rational(exifIfd, 0x829a)
    ExifDecoded(docId, long(ifd0, 0x0112).toInt, ascii(ifd0, 0x0132),
      en, ed, long(exifIfd, 0xa002), ifd0.size, exifIfd.size)
  }

  /** q273's pipeline: EXIF extraction — metadata-only walk, no pixel
    * decode; same typed mapPartitions shape. */
  def extractExif(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        length(col("text")).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) =>
        decodeExif(id, encodeExif(id, n)) })
      .toDF()
  }

  final case class FlacInfo(doc_id: Long, sample_rate: Int,
      channels: Int, bits_per_sample: Int, total_samples: Long,
      duration_us: Long, min_frame_size: Int, max_frame_size: Int,
      n_blocks: Int, padding_bytes: Long)

  /** FLAC fixture encoder — the metadata head of a .flac file:
    * "fLaC", a STREAMINFO block (34 bytes, big-endian, with the
    * spec's byte-MISALIGNED packed group: 20-bit sample rate, 3-bit
    * channels−1, 5-bit bps−1, 36-bit total samples in one 64-bit
    * field), then a last-flagged PADDING block. Field values derive
    * from (doc_id, text length) so extraction is closed-form. */
  private[graft] def encodeFlac(docId: Long, n: Int): Array[Byte] = {
    val pad = n % 50
    val out = java.nio.ByteBuffer.allocate(4 + 4 + 34 + 4 + pad)
    out.put("fLaC".getBytes("US-ASCII"))
    out.put(0x00.toByte) // STREAMINFO, not last
    def u24(v: Int): Unit = {
      out.put((v >> 16).toByte).put((v >> 8).toByte).put(v.toByte)
    }
    u24(34)
    out.putShort(4096).putShort(4096)
    u24(14); u24(14 + n % 100)
    val total = n.toLong * 100 + docId % 37
    val packed = (44100L << 44) | ((docId % 2) << 41) |
      (15L << 36) | total
    out.putLong(packed)
    (0 until 16).foreach(_ => out.put(0.toByte)) // audio md5 unknown
    out.put((0x80 | 0x01).toByte) // PADDING, last-block flag
    u24(pad)
    (0 until pad).foreach(_ => out.put(0.toByte))
    out.array()
  }

  /** REAL FLAC metadata walk — the "how long is this audio, what
    * format" probe a corpus runs before any decode: magic, block
    * headers (last-flag bit + 7-bit type + u24 length), STREAMINFO
    * REQUIRED FIRST per the spec, its byte-misaligned 20/3/5/36-bit
    * packed group unpacked by shifts, PADDING verified all-zero,
    * unknown block types skipped by declared length (the spec's
    * forward-compatibility rule), type 127 invalid. Trailing bytes
    * after the last-flagged block (no frames in the fixture) throw. */
  private[graft] def decodeFlac(docId: Long, bytes: Array[Byte])
      : FlacInfo = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"flac decode [$docId]: $why")
    if (bytes.length < 8 ||
        new String(bytes, 0, 4, "US-ASCII") != "fLaC")
      fail("bad magic")
    var p = 4
    var first = true
    var last = false
    var nBlocks = 0
    var padBytes = 0L
    var rate = -1
    var ch = 0
    var bps = 0
    var total = 0L
    var minFrame = 0
    var maxFrame = 0
    def u24(at: Int): Int =
      ((bytes(at) & 0xff) << 16) | ((bytes(at + 1) & 0xff) << 8) |
        (bytes(at + 2) & 0xff)
    while (!last) {
      if (p + 4 > bytes.length) fail("truncated block header")
      val hdr = bytes(p) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val blen = u24(p + 1)
      p += 4
      if (p + blen > bytes.length) fail(s"block type $typ overruns")
      if (first && typ != 0) fail("STREAMINFO must be the first block")
      typ match {
        case 0 =>
          if (!first) fail("duplicate STREAMINFO")
          if (blen != 34) fail(s"STREAMINFO length $blen != 34")
          minFrame = u24(p + 4)
          maxFrame = u24(p + 7)
          val bb = java.nio.ByteBuffer.wrap(bytes, p + 10, 8)
          val packed = bb.getLong
          rate = (packed >>> 44).toInt
          if (rate == 0) fail("sample rate 0 is invalid")
          ch = ((packed >>> 41) & 7).toInt + 1
          bps = ((packed >>> 36) & 31).toInt + 1
          total = packed & ((1L << 36) - 1)
        case 1 =>
          var i = p
          while (i < p + blen) {
            if (bytes(i) != 0) fail(s"nonzero PADDING byte at $i")
            i += 1
          }
          padBytes += blen
        case 127 => fail("block type 127 is invalid")
        case _   => () // unknown types skip by length, per spec
      }
      nBlocks += 1
      first = false
      p += blen
    }
    if (p != bytes.length) fail("trailing bytes after last block")
    if (rate < 0) fail("no STREAMINFO")
    FlacInfo(docId, rate, ch, bps, total,
      total * 1000000L / rate, minFrame, maxFrame, nBlocks, padBytes)
  }

  /** q276's pipeline: metadata-only walk like q273's EXIF. */
  def extractFlacInfo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        length(col("text")).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) =>
        decodeFlac(id, encodeFlac(id, n)) })
      .toDF()
  }

  final case class Mp4Meta(doc_id: Long, n_boxes: Int, brand: String,
      timescale: Long, duration_units: Long, duration_ms: Long,
      next_track_id: Long, free_bytes: Long)

  /** MP4 / ISO-BMFF fixture encoder (ISO 14496-12, the container
    * every video corpus ships in): `ftyp` (brand "isom"), a `free`
    * box with n % 64 padding bytes carried through the spec's
    * 64-BIT EXTENDED SIZE form (size field 1 + u64 largesize — the
    * branch naive walkers skip), and a `moov` whose nested `mvhd`
    * (version 0) carries timescale 1000 and duration 40·n units +
    * doc_id % 40 ms. All big-endian. */
  private[graft] def encodeMp4(docId: Long, n: Int): Array[Byte] = {
    val pad = n % 64
    val dur = 40L * n + docId % 40
    val mvhd = java.nio.ByteBuffer.allocate(8 + 100)
    mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
    mvhd.putInt(0)          // version 0, flags 0
    mvhd.putInt(0).putInt(0) // creation, modification
    mvhd.putInt(1000)       // timescale
    mvhd.putInt(dur.toInt)  // duration (fits: ≤ ~22k)
    mvhd.putInt(0x00010000) // rate 1.0
    mvhd.putShort(0x0100.toShort).putShort(0) // volume, reserved
    mvhd.putInt(0).putInt(0)
    // identity matrix (9 × u32)
    mvhd.putInt(0x00010000).putInt(0).putInt(0)
    mvhd.putInt(0).putInt(0x00010000).putInt(0)
    mvhd.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => mvhd.putInt(0)) // pre_defined
    mvhd.putInt((2 + docId % 5).toInt)       // next_track_ID
    val out = java.nio.ByteBuffer.allocate(
      16 + (16 + pad) + (8 + 108))
    out.putInt(16).put("ftyp".getBytes("US-ASCII"))
    out.put("isom".getBytes("US-ASCII")).putInt(0x200)
    out.putInt(1).put("free".getBytes("US-ASCII")) // extended size
    out.putLong(16L + pad)
    (0 until pad).foreach(_ => out.put(0.toByte))
    out.putInt(8 + 108).put("moov".getBytes("US-ASCII"))
    out.put(mvhd.array())
    out.array()
  }

  /** REAL ISO-BMFF box walk — the "what is this video" probe: u32
    * size + fourcc headers, size==1 → the u64 largesize form,
    * size==0 (to-end-of-file) rejected as out of the fixture's
    * grammar, containers (`moov`) recursed INTO rather than skipped,
    * `mvhd` version/flags parsed and its timescale/duration/
    * next-track-id extracted, unknown leaf boxes skipped by size.
    * Overruns, truncations, and a missing mvhd all throw. */
  private[graft] def decodeMp4(docId: Long, bytes: Array[Byte])
      : Mp4Meta = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"mp4 decode [$docId]: $why")
    def be32(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    def be64(at: Int): Long = (be32(at) << 32) | be32(at + 4)
    var nBoxes = 0
    var brand = ""
    var timescale = -1L
    var dur = -1L
    var nextTrack = -1L
    var freeBytes = 0L
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var p = from
      while (p < to) {
        if (p + 8 > to) fail(s"truncated box header at $p")
        val size32 = be32(p)
        val typ = new String(bytes, p + 4, 4, "US-ASCII")
        var hdr = 8
        val size =
          if (size32 == 1L) { // 64-bit extended size
            if (p + 16 > to) fail(s"truncated largesize at $p")
            hdr = 16
            be64(p + 8)
          } else if (size32 == 0L) {
            fail("size-0 (to-EOF) boxes out of the fixture grammar")
          } else size32
        if (size < hdr || p + size > to)
          fail(s"box $typ overruns: size $size at $p")
        nBoxes += 1
        typ match {
          case "ftyp" =>
            if (size < hdr + 8) fail("ftyp too short")
            brand = new String(bytes, p + hdr, 4, "US-ASCII")
          case "free" =>
            freeBytes += size - hdr
          case "moov" =>
            walk(p + hdr, p + size.toInt, depth + 1)
          case "mvhd" =>
            if (depth == 0) fail("mvhd outside moov")
            val v = bytes(p + hdr) & 0xff
            if (v != 0) fail(s"mvhd version $v unsupported")
            timescale = be32(p + hdr + 12)
            dur = be32(p + hdr + 16)
            nextTrack = be32(p + hdr + 96)
          case _ => () // unknown leaf: skip by size
        }
        p += size.toInt
      }
      if (p != to) fail(s"box run overshoots: $p != $to")
    }
    walk(0, bytes.length, 0)
    if (brand.isEmpty) fail("missing ftyp")
    if (timescale <= 0) fail("missing mvhd")
    Mp4Meta(docId, nBoxes, brand, timescale, dur,
      dur * 1000L / timescale, nextTrack, freeBytes)
  }

  /** q278's pipeline: metadata-only walk like q273/q276. */
  def extractMp4Meta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        length(col("text")).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) =>
        decodeMp4(id, encodeMp4(id, n)) })
      .toDF()
  }

  /** q272's pipeline: the lake-codec interop matrix — the SAME
    * payload round-tripped through all three block codecs a Spark
    * lake actually uses (zstd, lz4, snappy — each via the exact
    * library the parquet/ORC writers link), with features computed
    * from the DECOMPRESSED bytes so the data genuinely flows through
    * each codec. The payload is the doc text repeated 4×, so every
    * LZ-family codec provably finds whole-text matches and the
    * compressed-smaller flag is deterministic; a codec that corrupts
    * one byte fails the sameElements gate loudly. */
  def codecMatrix(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, text) =>
        val orig = new Array[Byte](text.length * 4)
        var k = 0
        while (k < 4) {
          System.arraycopy(text, 0, orig, k * text.length, text.length)
          k += 1
        }
        def row(codec: String, compressed: Array[Byte],
            decompressed: Array[Byte]): (Long, String, Long, Long,
            Boolean) = {
          if (!java.util.Arrays.equals(decompressed, orig))
            throw new IllegalArgumentException(
              s"$codec round-trip corrupted doc $id")
          var sum = 0L
          var i = 0
          while (i < decompressed.length) {
            sum += (i + 1).toLong * (decompressed(i) & 0xff); i += 1
          }
          (id, codec, orig.length.toLong, sum,
            compressed.length < orig.length)
        }
        val z = com.github.luben.zstd.Zstd.compress(orig, 3)
        val l4c = net.jpountz.lz4.LZ4Factory.fastestInstance()
        val l = l4c.fastCompressor().compress(orig)
        val s = org.xerial.snappy.Snappy.compress(orig)
        Iterator(
          row("zstd",
            z, com.github.luben.zstd.Zstd.decompress(z, orig.length)),
          row("lz4",
            l, l4c.fastDecompressor().decompress(l, orig.length)),
          row("snappy", s, org.xerial.snappy.Snappy.uncompress(s)))
      })
      .toDF("doc_id", "codec", "orig_bytes", "checksum",
        "roundtrip_smaller")
      .orderBy("doc_id", "codec")
  }

  /** q263's pipeline: WARC shard assembly + record walk — the crawl
    * container next to q260's tar. Docs group into WARC files of 16
    * responses (doc_id div 16) behind one warcinfo record; decode is
    * per-file sequential, files are the parallelism unit — exactly
    * how a CommonCrawl reader scales (one task per .warc.gz). */
  def decodeWarcShards(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(expr("doc_id div 16").as("shard_id"), col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val members = it.map(t => (t._2, t._3)).toSeq.sortBy(_._1)
        val warc = encodeWarcShard(shard, members)
        val (nRec, recs) = decodeWarcShard(shard, warc)
        recs.map(r => (shard, r.docId, r.targetUri, r.status,
          r.recordBytes, r.bodyBytes, r.bodyChecksum, nRec.toLong,
          warc.length.toLong))
      }
      .toDF("shard_id", "doc_id", "target_uri", "http_status",
        "record_bytes", "body_bytes", "body_checksum", "n_records",
        "file_bytes")
      .orderBy("doc_id")
  }

  /** q260's pipeline: WebDataset-style shard assembly + ustar decode.
    * Docs group into shards of 32 (doc_id div 32 — contiguous ranges,
    * the WebDataset convention), each shard becomes ONE tar stream,
    * and the decoder walks it back to per-member rows plus shard
    * integrity columns (member count, exact shard byte size). The
    * Spark shape is the real one: shard assembly is a bounded
    * groupByKey (≤ 32 small members per group), decode is per-shard
    * sequential — shards are the parallelism unit, exactly as a
    * WebDataset reader scales. */
  def decodeTarShards(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(expr("doc_id div 32").as("shard_id"), col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val members = it.map(t => (t._2, t._3)).toSeq
        val tar = encodeTarShard(members)
        decodeTarShard(shard, tar).map { case (id, nb, bs) =>
          (shard, id, nb, bs, members.size, tar.length.toLong)
        }
      }
      .toDF("shard_id", "doc_id", "member_bytes", "byte_sum",
        "n_members", "shard_bytes")
      .orderBy("doc_id")
  }

  /** q259's Hamming-ball pair table over a (doc_id, text) frame:
    * multi-index pigeonhole retrieval on the 24-bit phash — the
    * binary-code serving shape. The code splits into `blocks` (4)
    * disjoint 6-bit blocks; a pair within Hamming distance
    * `maxHamming` (<= blocks − 1) agrees exactly on at least one
    * block (pigeonhole), so candidates are an equi-join on
    * (block_id, block_value) — bucket-bounded, never all-pairs — and
    * the XOR-popcount verify rides INSIDE the join condition. Split
    * out so MultimodalSpec pins the guarantee (pairs at distance
    * exactly maxHamming are found; pairs one bit past it are not)
    * against a brute-force twin on crafted codes. */
  private[graft] def phashHammingPairs(docs: DataFrame, maxHamming: Int)
      : DataFrame = {
    require(maxHamming <= 3, "pigeonhole over 4 blocks covers <= 3 bits")
    val hashed = spread(docs)
      .filter(length(col("text")) >= 12)
      .withColumn("h", expr("CAST(FLOOR(length(text) / 12.0) AS INT)"))
      .withColumn("phash", expr(phashSql("text", "h")))
      .select(col("doc_id"), col("phash"))
    phashHammingPairsFromCodes(hashed, maxHamming)
  }

  /** The blocking + verify over a precomputed (doc_id, phash) frame —
    * the piece the spec brute-forces against. */
  private[graft] def phashHammingPairsFromCodes(hashed: DataFrame,
      maxHamming: Int): DataFrame = {
    val blocks = hashed.select(col("doc_id"), col("phash"),
        explode(array((0 until 4).map(lit): _*)).as("blk"))
      .withColumn("bv", expr("shiftright(phash, 6 * blk) % 64"))
    DedupOps.bucketPairs(blocks, Seq("blk", "bv"),
        pairCond = expr(s"bit_count(x.phash ^ y.phash) <= $maxHamming"),
        outCols = Seq(col("x.doc_id").as("a_id"),
          col("y.doc_id").as("b_id"),
          expr("bit_count(x.phash ^ y.phash)").as("hamming")))
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** q251's pipeline: the JPEG tier of the image decode family — same
    * typed mapPartitions shape as [[decodeImagesPng]]; payloads
    * shorter than one byte pair yield the zero row (the oracle's
    * nb = 0 CASE). */
  def decodeImagesJpeg(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        if (b.length < 2)
          JpegDecoded(id, 0, 0, 0L, 0L, 0.0, 0.0, 0.0, 0.0, 0, 0L)
        else decodeJpeg(id, encodeJpeg(b))
      })
      .toDF()
  }

  // ------------------------------------------------------------------
  // q284 — TFRecord shards (the TensorFlow training-data container)
  // ------------------------------------------------------------------

  /** TFRecord's masked CRC32C: rotate right 15, add the magic — the
    * exact transform tf.io uses so a CRC of a CRC never looks valid. */
  private def maskedCrc32c(b: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, 0, b.length)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def putIntLE(out: java.io.ByteArrayOutputStream, v: Int)
      : Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def putLongLE(out: java.io.ByteArrayOutputStream, v: Long)
      : Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** TFRecord shard encoder: per record `len(8 LE) + maskedCRC32C(len)
    * (4 LE) + payload + maskedCRC32C(payload) (4 LE)` — the on-disk
    * grammar of TFRecordWriter. Payload is `"<doc_id>\n<text>"` (the
    * id travels in-band, as a real example proto would carry it). */
  private[graft] def encodeTfRecordShard(
      members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.sortBy(_._1).foreach { case (id, text) =>
      val idb = s"$id\n".getBytes("US-ASCII")
      val payload = new Array[Byte](idb.length + text.length)
      System.arraycopy(idb, 0, payload, 0, idb.length)
      System.arraycopy(text, 0, payload, idb.length, text.length)
      val lenB = new java.io.ByteArrayOutputStream()
      putLongLE(lenB, payload.length.toLong)
      val lb = lenB.toByteArray
      out.write(lb)
      putIntLE(out, maskedCrc32c(lb))
      out.write(payload)
      putIntLE(out, maskedCrc32c(payload))
    }
    out.toByteArray
  }

  final case class TfRecordRow(shard_id: Long, doc_id: Long,
      record_bytes: Int, payload_bytes: Int, text_bytes: Int,
      byte_sum: Long)

  /** REAL TFRecord walk: read the length word, verify its masked
    * CRC32C, bound-check, read the payload, verify ITS masked CRC32C
    * — both checks fail loud (a reader that skips them propagates
    * silent corruption into training). Returns per-record rows. */
  private[graft] def decodeTfRecordShard(shardId: Long,
      bytes: Array[Byte]): Seq[TfRecordRow] = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"tfrecord shard $shardId: $why")
    def readIntLE(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) |
        ((bytes(off + 3) & 0xff) << 24)
    var pos = 0
    val rows = Seq.newBuilder[TfRecordRow]
    while (pos < bytes.length) {
      if (pos + 12 > bytes.length) fail(s"truncated header at $pos")
      var len = 0L
      var i = 0
      while (i < 8) {
        len |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1
      }
      val lenB = java.util.Arrays.copyOfRange(bytes, pos, pos + 8)
      if (readIntLE(pos + 8) != maskedCrc32c(lenB))
        fail(s"length CRC mismatch at $pos")
      if (len < 0 || pos + 12 + len + 4 > bytes.length)
        fail(s"record overruns shard at $pos (len=$len)")
      val pStart = pos + 12
      val payload = java.util.Arrays.copyOfRange(
        bytes, pStart, pStart + len.toInt)
      if (readIntLE(pStart + len.toInt) != maskedCrc32c(payload))
        fail(s"payload CRC mismatch at $pos")
      val nl = payload.indexOf('\n'.toByte)
      if (nl <= 0) fail(s"payload missing id line at $pos")
      val id = new String(payload, 0, nl, "US-ASCII").toLong
      var sum = 0L
      var j = nl + 1
      while (j < payload.length) { sum += payload(j) & 0xff; j += 1 }
      rows += TfRecordRow(shardId, id, 16 + payload.length,
        payload.length, payload.length - nl - 1, sum)
      pos = pStart + len.toInt + 4
    }
    rows.result()
  }

  /** q284's pipeline: WebDataset-convention sharding (doc_id div 32,
    * contiguous ranges), ONE TFRecord stream per shard, decode back
    * to per-record rows plus shard integrity columns. Shards are the
    * parallelism unit — exactly how tf.data readers scale. */
  def decodeTfRecordShards(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(expr("doc_id div 32").as("shard_id"), col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val members = it.map(t => (t._2, t._3)).toSeq
        val stream = encodeTfRecordShard(members)
        val rows = decodeTfRecordShard(shard, stream)
        val n = rows.length
        rows.map(r => (r.shard_id, r.doc_id, r.record_bytes,
          r.payload_bytes, r.text_bytes, r.byte_sum, n,
          stream.length.toLong))
      }
      .toDF("shard_id", "doc_id", "record_bytes", "payload_bytes",
        "text_bytes", "byte_sum", "n_records", "file_bytes")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // q290 — MP3: ID3v2.3 tag + MPEG-1 Layer III frame-header walk
  // ------------------------------------------------------------------

  /** MPEG-1 Layer III bitrate table, the slice this fixture cycles
    * through (indexes 9–13). */
  private val Mp3Kbps = Array(128, 160, 192, 224, 256)

  private def syncsafe(v: Int): Array[Byte] = Array(
    ((v >>> 21) & 0x7f).toByte, ((v >>> 14) & 0x7f).toByte,
    ((v >>> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  /** MP3 fixture: an ID3v2.3 tag (syncsafe size — THE classic parser
    * bug — one TIT2 text frame) followed by one MPEG-1 Layer III
    * frame per token: 0xFFFB sync, bitrate index cycling 9–13 at
    * 44.1 kHz, alternating padding bit, deterministic filler. */
  private[graft] def encodeMp3(docId: Long, nFrames: Int)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val title = s"doc $docId".getBytes("US-ASCII")
    // ID3v2.3: header(10) + one TIT2 frame (10 + 1 + title)
    val bodyLen = 10 + 1 + title.length
    out.write("ID3".getBytes("US-ASCII"))
    out.write(3); out.write(0); out.write(0) // version 2.3.0, flags 0
    out.write(syncsafe(bodyLen))
    out.write("TIT2".getBytes("US-ASCII"))
    val fs = 1 + title.length // v2.3 frame size: plain uint32 BE
    out.write((fs >>> 24) & 0xff); out.write((fs >>> 16) & 0xff)
    out.write((fs >>> 8) & 0xff); out.write(fs & 0xff)
    out.write(0); out.write(0) // frame flags
    out.write(0) // text encoding: ISO-8859-1
    out.write(title)
    // bulk frame writes: BAOS.write(int) is synchronized per byte —
    // per-frame array writes keep the encoder out of the profile
    val frame = new Array[Byte](144000 * 256 / 44100 + 1)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
    var f = 0
    while (f < nFrames) {
      val kbps = Mp3Kbps(((docId + f) % 5).toInt)
      val pad = ((docId + f) % 2).toInt
      val flen = 144000 * kbps / 44100 + pad
      frame(2) = ((9 + (docId + f) % 5).toInt << 4 | pad << 1).toByte
      frame(3) = 0
      java.util.Arrays.fill(frame, 4, flen,
        ((docId + f) % 251).toByte)
      out.write(frame, 0, flen)
      f += 1
    }
    out.toByteArray
  }

  final case class Mp3Parsed(doc_id: Long, title: String,
      n_frames: Long, id3_bytes: Int, audio_bytes: Long,
      total_samples: Long, duration_ms: Long, bitrate_kbps_sum: Long,
      payload_sum: Long)

  /** REAL MP3 walk: ID3v2 header with SYNCSAFE size decode, TIT2
    * frame parse (v2.3 plain-uint32 frame size — mixing the two size
    * grammars up is the classic tag-parser bug), then the MPEG frame
    * loop: sync/version/layer checks, bitrate/samplerate table
    * lookup, padding-aware frame length, strict truncation checks.
    * Any free bitrate, reserved index, lost sync or short frame
    * fails loud. */
  private[graft] def decodeMp3(docId: Long, bytes: Array[Byte])
      : Mp3Parsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"mp3 decode [$docId]: $why")
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
        bytes(2) != '3') fail("missing ID3v2 tag")
    if (bytes(3) != 3) fail(s"unsupported ID3v2.${bytes(3)}")
    if (((bytes(6) | bytes(7) | bytes(8) | bytes(9)) & 0x80) != 0)
      fail("non-syncsafe tag size byte")
    val tagBody = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    val id3End = 10 + tagBody
    if (id3End > bytes.length) fail("tag overruns file")
    if (new String(bytes, 10, 4, "US-ASCII") != "TIT2")
      fail("expected TIT2 frame")
    val fSize = ((bytes(14) & 0xff) << 24) | ((bytes(15) & 0xff) << 16) |
      ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
    if (10 + 10 + fSize != id3End) fail("TIT2 size inconsistent")
    if (bytes(20) != 0) fail("unexpected text encoding")
    val title = new String(bytes, 21, fSize - 1, "ISO-8859-1")
    var pos = id3End
    var frames = 0L; var kbpsSum = 0L; var paySum = 0L
    while (pos < bytes.length) {
      if (pos + 4 > bytes.length) fail(s"truncated header at $pos")
      if ((bytes(pos) & 0xff) != 0xff || (bytes(pos + 1) & 0xff) != 0xfb)
        fail(s"lost sync at $pos")
      val brIdx = (bytes(pos + 2) & 0xff) >>> 4
      if (brIdx == 0 || brIdx == 15) fail(s"free/bad bitrate at $pos")
      if (brIdx < 9 || brIdx > 13)
        fail(s"bitrate index $brIdx outside fixture table")
      val srIdx = (bytes(pos + 2) >>> 2) & 0x3
      if (srIdx != 0) fail(s"unexpected samplerate index $srIdx")
      val pad = (bytes(pos + 2) >>> 1) & 0x1
      val kbps = Mp3Kbps(brIdx - 9)
      val flen = 144000 * kbps / 44100 + pad
      if (pos + flen > bytes.length) fail(s"frame overruns file at $pos")
      var i = pos + 4
      while (i < pos + flen) { paySum += bytes(i) & 0xff; i += 1 }
      frames += 1; kbpsSum += kbps
      pos += flen
    }
    if (frames == 0) fail("no audio frames")
    Mp3Parsed(docId, title, frames, id3End,
      (bytes.length - id3End).toLong, 1152L * frames,
      1152L * frames * 1000 / 44100, kbpsSum, paySum)
  }

  /** q290's pipeline: one MP3 per doc (a frame per token), strict
    * walk back; narrow per-row work. */
  def decodeMp3Files(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val n = text.trim.toLowerCase.split("\\s+").length
        decodeMp3(id, encodeMp3(id, n))
      })
      .toDF()
  }

  // ------------------------------------------------------------------
  // q304 — format sniffing (magic dispatch + verify-to-identify)
  // ------------------------------------------------------------------

  /** q304's pipeline: a MIXED binary column (six container formats
    * cycling by doc_id) pushed through a REAL sniffer — the
    * ingest-dispatch every heterogeneous 100 TB dump needs. Magic
    * bytes identify BMP/Ogg/ZIP/MP3; ICO has NO magic and is
    * identified by its ICONDIR shape (reserved 0, type 1 — the rule
    * real sniffers use); TFRecord has neither magic nor shape and
    * falls through to VERIFY-TO-IDENTIFY: attempt the length-word
    * masked-CRC32C check, the only honest way to spot one. Each hit
    * then runs the format's REAL decoder (fail loud), emitting one
    * cross-checkable feature per format. */
  def sniffFormats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, text) =>
        val container = (id % 6) match {
          case 0 => encodeBmp(text)
          case 1 => encodeOgg(id, text)
          case 2 => encodeTfRecordShard(Seq((id, text)))
          case 3 => encodeZipShard(Seq((id, text)))
          case 4 => encodeMp3(id,
            new String(text, "US-ASCII").trim.split("\\s+").length)
          case _ => encodeIco(text)
        }
        val (fmt, feature) = sniffAndDecode(id, container)
        (id, fmt, feature)
      })
      .toDF("doc_id", "fmt", "feature")
  }

  /** The dispatcher: magic → shape → CRC probe, then the REAL
    * decoder of whatever was identified. */
  private[graft] def sniffAndDecode(id: Long, b: Array[Byte])
      : (String, Long) = {
    def u16(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    if (b.length >= 4 && b(0) == 'B' && b(1) == 'M')
      ("bmp", decodeBmp(id, b).top_left_blue.toLong)
    else if (b.length >= 4 && b(0) == 'O' && b(1) == 'g' &&
        b(2) == 'g' && b(3) == 'S')
      ("ogg", decodeOgg(id, b).byte_sum)
    else if (b.length >= 4 && b(0) == 'P' && b(1) == 'K' &&
        b(2) == 3 && b(3) == 4)
      ("zip", decodeZipShard(id / 16, b).head.byte_sum)
    else if (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      ("mp3", decodeMp3(id, b).n_frames)
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'E' &&
        b(10) == 'B' && b(11) == 'P') {
      // RIFF alone is ambiguous (WAV shares it); the form type at
      // offset 8 disambiguates — the rule every image sniffer uses
      val m = decodeWebp(id, b)
      ("webp", m.width.toLong * 100000L + m.height)
    }
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' &&
        b(6) == 'y' && b(7) == 'p' && b(8) == 'a' && b(9) == 'v' &&
        b(10) == 'i' && b(11) == 'f')
      // ISO-BMFF has no offset-0 magic; the ftyp box's major brand
      // is the identification rule (ISO 14496-12 §4.3)
      ("avif", decodeAvif(id, b).byte_sum)
    else if (b.length >= 6 && u16(0) == 0 && u16(2) == 1)
      ("ico", decodeIco(id, b).top_left_blue.toLong)
    else {
      // verify-to-identify: a TFRecord stream proves itself by its
      // masked length CRC — random bytes fail with p ≈ 2⁻³²
      val rows = decodeTfRecordShard(id / 32, b)
      ("tfrecord", rows.head.byte_sum)
    }
  }

  // ------------------------------------------------------------------
  // q307 — WebP + AVIF sniffing (the modern image-crawl tier)
  // ------------------------------------------------------------------

  final case class WebpMeta(doc_id: Long, width: Int, height: Int,
      n_chunks: Int, data_bytes: Long, byte_sum: Long)

  /** WebP fixture (RIFF container + VP8L lossless chunk): "RIFF" +
    * u32le payload size + "WEBP" form type, then one "VP8L" chunk
    * whose body starts with the REAL VP8L header — signature byte
    * 0x2F and the LSB-first-packed 14-bit width−1 / 14-bit height−1
    * / alpha / 3-bit version fields (VP8L bitstream spec §3) —
    * followed by the doc's bytes as opaque entropy data. Odd chunk
    * sizes take RIFF's pad byte (the WAV/WebP quirk naive walkers
    * drop). */
  private[graft] def encodeWebp(w: Int, h: Int, data: Array[Byte])
      : Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384,
      s"VP8L dims out of the 14-bit range: ${w}x$h")
    val body = 5 + data.length // VP8L header + opaque data
    val pad = body & 1
    val out = java.nio.ByteBuffer.allocate(12 + 8 + body + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + body + pad)
    out.put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(body)
    // 0x2F, then 32 bits LSB-first: w-1 (14) | h-1 (14) | alpha (1)
    // | version (3) — a little-endian u32 write IS LSB-first order
    out.put(0x2f.toByte).putInt((w - 1) | ((h - 1) << 14))
    out.put(data)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  /** REAL WebP walk: RIFF magic, the container size cross-checked
    * against the file extent, WEBP form type, fourcc+u32le chunk walk
    * with the odd-size pad rule, exactly one VP8L chunk required, its
    * 0x2F signature and version-0 field enforced, dimensions unpacked
    * from the LSB-first header, opaque data byte-summed. Truncations,
    * size mismatches, and unknown signatures all throw. */
  private[graft] def decodeWebp(docId: Long, bytes: Array[Byte])
      : WebpMeta = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"webp decode [$docId]: $why")
    def le32(at: Int): Long =
      (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
        ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
    def fourcc(at: Int) = new String(bytes, at, 4, "US-ASCII")
    if (bytes.length < 20) fail("truncated RIFF header")
    if (fourcc(0) != "RIFF") fail("missing RIFF magic")
    if (le32(4) != bytes.length - 8)
      fail(s"RIFF size ${le32(4)} != payload ${bytes.length - 8}")
    if (fourcc(8) != "WEBP") fail(s"form type ${fourcc(8)} != WEBP")
    var p = 12
    var nChunks = 0
    var width = -1
    var height = -1
    var dataBytes = -1L
    var byteSum = -1L
    while (p < bytes.length) {
      if (p + 8 > bytes.length) fail(s"truncated chunk header at $p")
      val cc = fourcc(p)
      val size = le32(p + 4)
      val pad = size & 1 // RIFF: odd chunk bodies take a pad byte
      if (p + 8 + size + pad > bytes.length)
        fail(s"chunk $cc overruns: size $size at $p")
      nChunks += 1
      if (cc == "VP8L") {
        if (width >= 0) fail("duplicate VP8L chunk")
        if (size < 5) fail("VP8L body too short")
        if ((bytes(p + 8) & 0xff) != 0x2f)
          fail(f"VP8L signature 0x${bytes(p + 8) & 0xff}%02x != 0x2f")
        val packed = le32(p + 9)
        width = (packed & 0x3fff).toInt + 1
        height = ((packed >> 14) & 0x3fff).toInt + 1
        val version = ((packed >> 29) & 0x7).toInt
        if (version != 0) fail(s"VP8L version $version unsupported")
        dataBytes = size - 5
        byteSum = (0L until dataBytes).map(i =>
          (bytes(p + 13 + i.toInt) & 0xff).toLong).sum
      }
      p += 8 + size.toInt + pad.toInt
    }
    if (p != bytes.length) fail(s"chunk run overshoots: $p")
    if (width < 0) fail("missing VP8L chunk")
    WebpMeta(docId, width, height, nChunks, dataBytes, byteSum)
  }

  final case class AvifMeta(doc_id: Long, n_boxes: Int, brand: String,
      width: Int, height: Int, mdat_bytes: Long, byte_sum: Long,
      free_bytes: Long)

  /** AVIF fixture (ISO-BMFF like q278's MP4, brand "avif"): `ftyp`
    * (major brand avif, compatible mif1), a `meta` FULLBOX carrying
    * the HEIF property chain that holds the image dimensions —
    * `hdlr` (handler 'pict', the still-image rule) and
    * `iprp` → `ipco` → `ispe` (ImageSpatialExtentsProperty: fullbox +
    * u32 width + u32 height, ISO 23008-12 §6.5.3) — then a `free`
    * box with docId % 32 padding bytes and an `mdat` carrying the
    * doc's bytes. All big-endian u32 sizes. */
  private[graft] def encodeAvif(docId: Long, w: Int, h: Int,
      data: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"ispe dims must be positive: ${w}x$h")
    val pad = (docId % 32).toInt
    // meta(12) { hdlr(33) iprp(8) { ipco(8) { ispe(20) } } }
    val metaSize = 12 + 33 + 8 + 8 + 20
    val out = java.nio.ByteBuffer.allocate(
      20 + metaSize + (8 + pad) + (8 + data.length))
    out.putInt(20).put("ftyp".getBytes("US-ASCII"))
    out.put("avif".getBytes("US-ASCII")).putInt(0)
    out.put("mif1".getBytes("US-ASCII"))
    out.putInt(metaSize).put("meta".getBytes("US-ASCII")).putInt(0)
    out.putInt(33).put("hdlr".getBytes("US-ASCII")).putInt(0)
    out.putInt(0).put("pict".getBytes("US-ASCII"))
    (0 until 12).foreach(_ => out.put(0.toByte)) // reserved
    out.put(0.toByte) // empty NUL-terminated name
    out.putInt(8 + 8 + 20).put("iprp".getBytes("US-ASCII"))
    out.putInt(8 + 20).put("ipco".getBytes("US-ASCII"))
    out.putInt(20).put("ispe".getBytes("US-ASCII")).putInt(0)
    out.putInt(w).putInt(h)
    out.putInt(8 + pad).put("free".getBytes("US-ASCII"))
    (0 until pad).foreach(_ => out.put(0.toByte))
    out.putInt(8 + data.length).put("mdat".getBytes("US-ASCII"))
    out.put(data)
    out.array()
  }

  /** REAL ISO-BMFF walk for the AVIF probe: u32 size + fourcc boxes,
    * the FIRST box must be `ftyp` with major brand avif (the rule
    * sniffers key on), `free` padding accounted, `mdat` byte-summed,
    * overruns/truncations/size-0 boxes rejected — same discipline as
    * q278's MP4 walk, independent so each format's grammar stays
    * fail-loud on its own terms. The `meta` fullbox is walked for the
    * HEIF dimension chain: hdlr must declare handler 'pict', and
    * exactly one iprp→ipco→ispe supplies width/height (fullbox
    * version 0 enforced at both levels, zero dims rejected) — a
    * missing chain fails, making the decode dimension-grade, not just
    * a byte-sum sniff. */
  private[graft] def decodeAvif(docId: Long, bytes: Array[Byte])
      : AvifMeta = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"avif decode [$docId]: $why")
    def be32(at: Int): Long =
      ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    if (bytes.length < 16) fail("truncated ftyp")
    var width = -1
    var height = -1
    /** Child-box walk over [from, until) — the same size+fourcc
      * grammar at every nesting level. */
    def walkChildren(from: Int, until: Int)(
        onBox: (String, Int, Int) => Unit): Unit = {
      var q = from
      while (q < until) {
        if (q + 8 > until) fail(s"truncated child box header at $q")
        val size = be32(q)
        if (size < 8 || q + size > until)
          fail(s"child box overruns: size $size at $q")
        onBox(new String(bytes, q + 4, 4, "US-ASCII"), q, size.toInt)
        q += size.toInt
      }
      if (q != until) fail(s"child box run overshoots: $q")
    }
    def parseMeta(p: Int, size: Int): Unit = {
      if (size < 12) fail("meta too short for a fullbox")
      if (be32(p + 8) != 0) fail("meta fullbox version/flags != 0")
      var handler = ""
      walkChildren(p + 12, p + size) {
        case ("hdlr", q, sz) =>
          if (sz < 24) fail("hdlr too short")
          handler = new String(bytes, q + 16, 4, "US-ASCII")
        case ("iprp", q, sz) =>
          walkChildren(q + 8, q + sz) {
            case ("ipco", q2, sz2) =>
              walkChildren(q2 + 8, q2 + sz2) {
                case ("ispe", q3, sz3) =>
                  if (sz3 != 20) fail(s"ispe size $sz3 != 20")
                  if (be32(q3 + 8) != 0)
                    fail("ispe fullbox version/flags != 0")
                  if (width >= 0) fail("duplicate ispe")
                  width = be32(q3 + 12).toInt
                  height = be32(q3 + 16).toInt
                  if (width < 1 || height < 1)
                    fail(s"ispe dims ${width}x$height not positive")
                case _ => () // other item properties: skip
              }
            case _ => () // ipma etc.: skip
          }
        case _ => () // pitm/iloc/iinf etc.: skip
      }
      if (handler != "pict") fail(s"meta handler '$handler' != pict")
    }
    var p = 0
    var nBoxes = 0
    var brand = ""
    var mdatBytes = -1L
    var byteSum = -1L
    var freeBytes = 0L
    while (p < bytes.length) {
      if (p + 8 > bytes.length) fail(s"truncated box header at $p")
      val size = be32(p)
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      if (size < 8 || p + size > bytes.length)
        fail(s"box $typ overruns: size $size at $p")
      if (nBoxes == 0 && typ != "ftyp") fail(s"first box $typ != ftyp")
      nBoxes += 1
      typ match {
        case "ftyp" =>
          if (size < 16) fail("ftyp too short")
          brand = new String(bytes, p + 8, 4, "US-ASCII")
          if (brand != "avif") fail(s"major brand $brand != avif")
        case "meta" => parseMeta(p, size.toInt)
        case "free" => freeBytes += size - 8
        case "mdat" =>
          if (mdatBytes >= 0) fail("duplicate mdat")
          mdatBytes = size - 8
          byteSum = (0L until mdatBytes).map(i =>
            (bytes(p + 8 + i.toInt) & 0xff).toLong).sum
        case _ => () // unknown leaf: skip by size
      }
      p += size.toInt
    }
    if (p != bytes.length) fail(s"box run overshoots: $p")
    if (mdatBytes < 0) fail("missing mdat")
    if (width < 0) fail("missing meta/ispe dimension chain")
    AvifMeta(docId, nBoxes, brand, width, height, mdatBytes, byteSum,
      freeBytes)
  }

  /** q307's pipeline: the modern image-crawl half of the q304
    * dispatcher — WebP (doc_id even) and AVIF (odd) payloads pushed
    * through the SAME sniffer, which identifies them by RIFF/WEBP
    * magic and the ISO-BMFF ftyp-brand rule and then runs each
    * format's real walk. Dims derive from the doc for BOTH formats
    * (width 1+bytes%1000, height 1+tokens%500) so the decoded
    * columns are closed-form: WebP re-derives them from the VP8L
    * 14-bit packed header, AVIF from the meta→iprp→ipco→ispe HEIF
    * chain; the feature column is the packed dims (webp) / mdat byte
    * sum (avif) as before. Same narrow per-row shape as every decode
    * tier: embarrassingly parallel, zero shuffles before the
    * report. */
  def sniffModernImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, text) =>
        val w = 1 + (text.length % 1000)
        val h = 1 + (new String(text, "US-ASCII").trim
          .split("\\s+").length % 500)
        val container =
          if (id % 2 == 0) encodeWebp(w, h, text)
          else encodeAvif(id, w, h, text)
        // decode ONCE per row (r12 advice: routing avif through the
        // generic sniffer and then decoding AGAIN for dims doubled the
        // per-row work on half the corpus). The ftyp major-brand test
        // below IS the sniffer's avif rule (ISO 14496-12 §4.3);
        // MultimodalSpec pins that sniffAndDecode agrees with this
        // branch on the same container.
        val isAvif = container.length >= 12 && container(4) == 'f' &&
          container(5) == 't' && container(6) == 'y' &&
          container(7) == 'p' && container(8) == 'a' &&
          container(9) == 'v' && container(10) == 'i' &&
          container(11) == 'f'
        // decoded dims, re-read from each format's real header (the
        // webp feature already packs them; avif carries them in ispe)
        val (fmt, feature, dw, dh) =
          if (isAvif) {
            val a = decodeAvif(id, container)
            ("avif", a.byte_sum, a.width, a.height)
          } else {
            val (f, feat) = sniffAndDecode(id, container)
            (f, feat, (feat / 100000L).toInt, (feat % 100000L).toInt)
          }
        (id, fmt, feature, dw.toLong, dh.toLong)
      })
      .toDF("doc_id", "fmt", "feature", "image_w", "image_h")
  }

  // ------------------------------------------------------------------
  // q302 — ICO favicon walk (ICONDIR + headerless DIB, doubled height)
  // ------------------------------------------------------------------

  /** ICO fixture: ICONDIR + one entry + a HEADERLESS DIB whose
    * BITMAPINFOHEADER height is DOUBLED (XOR raster + the 1-bit AND
    * mask share it — THE ico quirk every naive BMP reuse gets
    * wrong). 3-px-wide 24-bit rows from the payload (bottom-up,
    * 4-byte strides), height capped at 32 so the entry's height
    * BYTE stays honest, all-zero AND mask rows padded to 32 bits. */
  private[graft] def encodeIco(bytes: Array[Byte]): Array[Byte] = {
    val h = math.min(bytes.length / 9, 32)
    val xor = h * 12
    val and = h * 4
    val out = java.nio.ByteBuffer.allocate(22 + 40 + xor + and)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putShort(0).putShort(1).putShort(1) // reserved, type=icon, count
    out.put(3.toByte).put(h.toByte).put(0.toByte).put(0.toByte)
    out.putShort(1).putShort(24) // planes, bpp
    out.putInt(40 + xor + and).putInt(22) // bytes in resource, offset
    out.putInt(40).putInt(3).putInt(2 * h) // DOUBLED height
    out.putShort(1).putShort(24).putInt(0).putInt(xor + and)
    out.putInt(0).putInt(0).putInt(0).putInt(0)
    var stored = h - 1 // bottom-up
    while (stored >= 0) {
      out.put(bytes, 9 * stored, 9).put(0.toByte).put(0.toByte)
        .put(0.toByte)
      stored -= 1
    }
    out.put(new Array[Byte](and))
    out.array()
  }

  final case class IcoDecoded(doc_id: Long, n_icons: Int, width: Int,
      height: Int, bpp: Int, ico_bytes: Int, mean_pixel: Double,
      top_left_blue: Int)

  /** REAL ICO walk: ICONDIR grammar (reserved 0, type 1), entry
    * fields cross-checked against the DIB (width, bpp, resource
    * extent), the DOUBLED-height rule enforced (a reader that feeds
    * the DIB to a plain BMP parser sees a 2h-tall image and shears
    * every mask), bottom-up XOR raster with pad bytes excluded from
    * the mean, and the AND mask verified all-transparent. */
  private[graft] def decodeIco(docId: Long, bytes: Array[Byte])
      : IcoDecoded = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"ico decode [$docId]: $why")
    if (bytes.length < 22) fail("truncated ICONDIR")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getShort(0) != 0) fail("reserved != 0")
    if (bb.getShort(2) != 1) fail("type != icon")
    val count = bb.getShort(4).toInt
    if (count != 1) fail(s"expected 1 icon, got $count")
    val w = bytes(6) & 0xff
    val h = bytes(7) & 0xff
    if ((bytes(8) & 0xff) != 0) fail("palette icon unexpected")
    val bpp = bb.getShort(12).toInt
    val res = bb.getInt(14)
    val off = bb.getInt(18)
    if (off + res > bytes.length || off < 22)
      fail("resource extent out of bounds")
    if (off + res != bytes.length) fail("trailing bytes after icon")
    if (bb.getInt(off) != 40) fail("not a BITMAPINFOHEADER")
    if (bb.getInt(off + 4) != w) fail("DIB width != entry width")
    // THE quirk: the DIB height covers XOR + AND and must be 2h
    if (bb.getInt(off + 8) != 2 * h)
      fail(s"DIB height ${bb.getInt(off + 8)} != doubled $h")
    if (bb.getShort(off + 12) != 1) fail("planes != 1")
    if (bb.getShort(off + 14) != bpp) fail("DIB bpp != entry bpp")
    if (bpp != 24) fail(s"unsupported bpp $bpp")
    if (bb.getInt(off + 16) != 0) fail("compressed icon unsupported")
    val xorStride = (w * 3 + 3) & ~3
    val andStride = ((w + 31) / 32) * 4
    if (off + 40 + h * (xorStride + andStride) != bytes.length)
      fail("raster + mask extent mismatch")
    var sum = 0L
    var r = 0
    while (r < h) {
      var i = off + 40 + r * xorStride
      val end = i + w * 3
      while (i < end) { sum += bytes(i) & 0xff; i += 1 }
      r += 1
    }
    val andStart = off + 40 + h * xorStride
    var j = andStart
    while (j < bytes.length) {
      if (bytes(j) != 0) fail(s"AND mask not transparent at $j")
      j += 1
    }
    val topLeftBlue =
      if (h == 0) 0
      else bytes(off + 40 + (h - 1) * xorStride) & 0xff
    IcoDecoded(docId, count, w, h, bpp, bytes.length,
      if (h == 0) 0.0 else sum.toDouble / (h * w * 3), topLeftBlue)
  }

  /** q302's pipeline: the favicon tier — same typed mapPartitions
    * shape as the other image decoders. */
  def decodeIcons(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeIco(id, encodeIco(b)) })
      .toDF()
  }

  // ------------------------------------------------------------------
  // q295 — Ogg page walk (capture, lacing, continuation, Ogg-CRC32)
  // ------------------------------------------------------------------

  /** Ogg's CRC32: polynomial 0x04C11DB7, init 0, NO reflection, NO
    * final xor — deliberately not the zlib CRC, and the reason every
    * generic-CRC library mis-validates Ogg pages. Table-driven. */
  private lazy val OggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def oggCrc(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc = (crc << 8) ^ OggCrcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  /** Ogg fixture: ONE packet (the doc text) laced into 255-byte
    * segments (a multiple-of-255 packet ends with the spec's 0-size
    * final segment), at most 2 segments per page so real texts span
    * pages — exercising the continuation flag (0x01), BOS (0x02),
    * EOS (0x04), page sequence numbers, and the page CRC (computed
    * with its own field zeroed). */
  private[graft] def encodeOgg(docId: Long, payload: Array[Byte])
      : Array[Byte] = {
    val l = payload.length
    val segs = l / 255 + 1 // final short (possibly 0-size) segment
    val lace = Array.tabulate(segs)(i =>
      if (i < segs - 1) 255 else l % 255)
    val pages = (segs + 1) / 2
    val out = new java.io.ByteArrayOutputStream()
    var seg = 0
    var off = 0
    var page = 0
    while (page < pages) {
      val n = math.min(2, segs - seg)
      val payLen = (0 until n).map(k => lace(seg + k)).sum
      val hdr = new Array[Byte](27 + n)
      hdr(0) = 'O'; hdr(1) = 'g'; hdr(2) = 'g'; hdr(3) = 'S'
      hdr(4) = 0 // version
      hdr(5) = (((if (page > 0) 1 else 0)) | // continuation
        (if (page == 0) 2 else 0) | // BOS
        (if (page == pages - 1) 4 else 0)).toByte // EOS
      val granule = (off + payLen).toLong
      var i = 0
      while (i < 8) {
        hdr(6 + i) = ((granule >>> (8 * i)) & 0xff).toByte; i += 1
      }
      i = 0
      while (i < 4) { // serial = doc_id (LE 32)
        hdr(14 + i) = ((docId >>> (8 * i)) & 0xff).toByte; i += 1
      }
      i = 0
      while (i < 4) { // page sequence
        hdr(18 + i) = ((page >>> (8 * i)) & 0xff).toByte; i += 1
      }
      // hdr(22..25) = CRC, zero during computation
      hdr(26) = n.toByte
      i = 0
      while (i < n) { hdr(27 + i) = lace(seg + i).toByte; i += 1 }
      val pageBytes = new Array[Byte](hdr.length + payLen)
      System.arraycopy(hdr, 0, pageBytes, 0, hdr.length)
      System.arraycopy(payload, off, pageBytes, hdr.length, payLen)
      val crc = oggCrc(pageBytes, 0, pageBytes.length)
      i = 0
      while (i < 4) {
        pageBytes(22 + i) = ((crc >>> (8 * i)) & 0xff).toByte; i += 1
      }
      out.write(pageBytes)
      seg += n
      off += payLen
      page += 1
    }
    out.toByteArray
  }

  final case class OggParsed(doc_id: Long, n_pages: Long,
      n_segments: Long, file_bytes: Long, payload_bytes: Long,
      byte_sum: Long)

  /** REAL Ogg walk: capture-pattern sync, version 0, the Ogg CRC
    * recomputed with the field zeroed (fail loud), strict flag
    * discipline (BOS only first, EOS only last, continuation on
    * every non-first page of the spanning packet), sequential page
    * numbers, constant serial, lacing-table reassembly. */
  private[graft] def decodeOgg(docId: Long, bytes: Array[Byte])
      : OggParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"ogg decode [$docId]: $why")
    var pos = 0
    var page = 0
    var segs = 0L
    var payload = 0L
    var sum = 0L
    var sawEos = false
    while (pos < bytes.length) {
      if (sawEos) fail("data after EOS page")
      if (pos + 27 > bytes.length) fail(s"truncated header at $pos")
      if (bytes(pos) != 'O' || bytes(pos + 1) != 'g' ||
          bytes(pos + 2) != 'g' || bytes(pos + 3) != 'S')
        fail(s"lost capture at $pos")
      if (bytes(pos + 4) != 0) fail("bad version")
      val flags = bytes(pos + 5) & 0xff
      if (page == 0 && (flags & 2) == 0) fail("first page not BOS")
      if (page > 0 && (flags & 2) != 0) fail("BOS on non-first page")
      if (page > 0 && (flags & 1) == 0)
        fail("continuation flag missing mid-packet")
      var serial = 0L
      var i = 0
      while (i < 4) {
        serial |= (bytes(pos + 14 + i) & 0xffL) << (8 * i); i += 1
      }
      if (serial != (docId & 0xffffffffL)) fail("serial mismatch")
      var seq = 0L
      i = 0
      while (i < 4) {
        seq |= (bytes(pos + 18 + i) & 0xffL) << (8 * i); i += 1
      }
      if (seq != page) fail(s"page sequence $seq != $page")
      val n = bytes(pos + 26) & 0xff
      if (pos + 27 + n > bytes.length) fail("truncated lacing table")
      var payLen = 0
      i = 0
      while (i < n) { payLen += bytes(pos + 27 + i) & 0xff; i += 1 }
      val end = pos + 27 + n + payLen
      if (end > bytes.length) fail("page payload overruns file")
      // CRC: recompute with the stored field zeroed
      var stored = 0
      i = 0
      while (i < 4) {
        stored |= (bytes(pos + 22 + i) & 0xff) << (8 * i); i += 1
      }
      val copy = java.util.Arrays.copyOfRange(bytes, pos, end)
      copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
      if (oggCrc(copy, 0, copy.length) != stored)
        fail(s"CRC mismatch on page $page")
      i = pos + 27 + n
      while (i < end) { sum += bytes(i) & 0xff; i += 1 }
      segs += n
      payload += payLen
      if ((flags & 4) != 0) sawEos = true
      pos = end
      page += 1
    }
    if (!sawEos) fail("stream missing EOS")
    OggParsed(docId, page.toLong, segs, bytes.length.toLong, payload,
      sum)
  }

  /** q295's pipeline: one Ogg stream per doc, strict page walk
    * back; narrow per-row work. */
  def decodeOggStreams(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        decodeOgg(id, encodeOgg(id, b))
      })
      .toDF()
  }

  // ------------------------------------------------------------------
  // q291 — protobuf wire-format walk (the tf.Example serialization)
  // ------------------------------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long)
      : Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Proto-style record, the wire shape a tf.Example actually is:
    * field 1 varint = doc_id, field 2 length-delimited = text bytes,
    * field 3 packed varints = per-token lengths, field 4 fixed64 =
    * text byte-sum, field 5 fixed32 = token count — all four wire
    * types on one message. Token lengths must fit one varint byte
    * (enforced; the corpus maxes far below 128). */
  private[graft] def encodeProto(docId: Long, text: Array[Byte],
      tokLens: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x08); writeVarint(out, docId)
    out.write(0x12); writeVarint(out, text.length.toLong)
    out.write(text, 0, text.length)
    tokLens.foreach(l => require(l > 0 && l < 128,
      s"token length $l outside 1-byte varint range"))
    out.write(0x1a); writeVarint(out, tokLens.length.toLong)
    tokLens.foreach(l => out.write(l))
    var sum = 0L
    text.foreach(b => sum += b & 0xff)
    out.write(0x21)
    var i = 0
    while (i < 8) { out.write(((sum >>> (8 * i)) & 0xff).toInt); i += 1 }
    out.write(0x2d)
    val n = tokLens.length
    out.write(n & 0xff); out.write((n >>> 8) & 0xff)
    out.write((n >>> 16) & 0xff); out.write((n >>> 24) & 0xff)
    out.toByteArray
  }

  final case class ProtoParsed(doc_id: Long, n_fields: Int,
      msg_bytes: Int, text_bytes: Int, n_tokens: Int,
      packed_sum: Long, checksum: Long)

  /** REAL generic proto walk: read tag varints, dispatch on wire
    * type (0 varint / 1 fixed64 / 2 length-delimited / 5 fixed32),
    * unpack the packed field, then CROSS-CHECK: the carried doc_id
    * must equal the shard's, the fixed64 checksum must equal the
    * byte-sum recomputed from the length-delimited payload, the
    * fixed32 count must equal the packed entry count. A walker that
    * mis-reads any varint boundary or wire type fails loud. */
  private[graft] def decodeProto(docId: Long, bytes: Array[Byte])
      : ProtoParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"proto decode [$docId]: $why")
    var pos = 0
    def readVarint(): Long = {
      var v = 0L; var shift = 0
      var more = true
      while (more) {
        if (pos >= bytes.length) fail("truncated varint")
        if (shift > 63) fail("varint overflow")
        val b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7; pos += 1
        more = (b & 0x80) != 0
      }
      v
    }
    var fields = 0
    var fDocId = -1L; var text: Array[Byte] = null
    var packed: Array[Byte] = null; var fixed64 = 0L; var fixed32 = -1L
    while (pos < bytes.length) {
      val tag = readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      fields += 1
      (field, wire) match {
        case (1, 0) => fDocId = readVarint()
        case (2, 2) =>
          val len = readVarint().toInt
          if (pos + len > bytes.length) fail("field 2 overruns")
          text = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
          pos += len
        case (3, 2) =>
          val len = readVarint().toInt
          if (pos + len > bytes.length) fail("field 3 overruns")
          packed = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
          pos += len
        case (4, 1) =>
          if (pos + 8 > bytes.length) fail("field 4 overruns")
          var i = 0
          fixed64 = 0L
          while (i < 8) {
            fixed64 |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1
          }
          pos += 8
        case (5, 5) =>
          if (pos + 4 > bytes.length) fail("field 5 overruns")
          fixed32 = (bytes(pos) & 0xffL) | ((bytes(pos + 1) & 0xffL) << 8) |
            ((bytes(pos + 2) & 0xffL) << 16) |
            ((bytes(pos + 3) & 0xffL) << 24)
          pos += 4
        case (f, w) => fail(s"unexpected field $f wire $w")
      }
    }
    if (fDocId != docId) fail(s"carried id $fDocId != $docId")
    if (text == null || packed == null || fixed32 < 0)
      fail("missing required field")
    // unpack field 3 (every entry one varint byte by construction)
    var pSum = 0L
    packed.foreach { b =>
      if ((b & 0x80) != 0) fail("multi-byte packed entry unexpected")
      pSum += b & 0xffL
    }
    var tSum = 0L
    text.foreach(b => tSum += b & 0xff)
    if (tSum != fixed64) fail(s"checksum $fixed64 != recomputed $tSum")
    if (fixed32 != packed.length)
      fail(s"count ${fixed32} != packed entries ${packed.length}")
    ProtoParsed(docId, fields, bytes.length, text.length,
      fixed32.toInt, pSum, fixed64)
  }

  /** q291's pipeline: encode + strict-walk one proto record per doc;
    * narrow per-row work (the tf.data deserialize shape). */
  def decodeProtoRecords(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val norm = text.trim.toLowerCase
        val toks = norm.split("\\s+")
        decodeProto(id, encodeProto(id, norm.getBytes("US-ASCII"),
          toks.map(_.length)))
      })
      .toDF()
  }

  // ------------------------------------------------------------------
  // q285 — ZIP archive walk (local headers + central directory + EOCD)
  // ------------------------------------------------------------------

  private def putShortLE(out: java.io.ByteArrayOutputStream, v: Int)
      : Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }

  /** ZIP shard encoder — APPNOTE's three-layer layout for real: local
    * file headers + data, the central directory, the end-of-central-
    * directory record. Even doc_ids are STORED, odd ones raw-DEFLATED
    * (both with true CRC32/size fields). Payload is the text repeated
    * 4× so `deflate_smaller` is deterministic (q272's trick). */
  private[graft] def encodeZipShard(members: Seq[(Long, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val cd = new java.io.ByteArrayOutputStream()
    var n = 0
    members.sortBy(_._1).foreach { case (id, text) =>
      val data = new Array[Byte](text.length * 4)
      var k = 0
      while (k < 4) {
        System.arraycopy(text, 0, data, k * text.length, text.length)
        k += 1
      }
      val name = s"doc$id.txt".getBytes("US-ASCII")
      val crc = { val c = new java.util.zip.CRC32
        c.update(data); c.getValue.toInt }
      val method = if (id % 2 == 0) 0 else 8
      val packed = if (method == 0) data else {
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(data); d.finish()
        val buf = new Array[Byte](data.length + 64)
        val m = d.deflate(buf)
        if (!d.finished)
          throw new IllegalStateException(s"deflate overflow doc $id")
        d.end()
        java.util.Arrays.copyOf(buf, m)
      }
      val off = out.size()
      putIntLE(out, 0x04034b50) // LFH signature
      putShortLE(out, 20); putShortLE(out, 0) // version, flags
      putShortLE(out, method)
      putShortLE(out, 0); putShortLE(out, 0x21) // dos time, date
      putIntLE(out, crc)
      putIntLE(out, packed.length); putIntLE(out, data.length)
      putShortLE(out, name.length); putShortLE(out, 0)
      out.write(name); out.write(packed)
      putIntLE(cd, 0x02014b50) // CD signature
      putShortLE(cd, 20); putShortLE(cd, 20) // made by, needed
      putShortLE(cd, 0); putShortLE(cd, method)
      putShortLE(cd, 0); putShortLE(cd, 0x21)
      putIntLE(cd, crc)
      putIntLE(cd, packed.length); putIntLE(cd, data.length)
      putShortLE(cd, name.length)
      putShortLE(cd, 0); putShortLE(cd, 0) // extra, comment len
      putShortLE(cd, 0); putShortLE(cd, 0) // disk, internal attrs
      putIntLE(cd, 0) // external attrs
      putIntLE(cd, off)
      cd.write(name)
      n += 1
    }
    val cdOff = out.size()
    val cdBytes = cd.toByteArray
    out.write(cdBytes)
    putIntLE(out, 0x06054b50) // EOCD signature
    putShortLE(out, 0); putShortLE(out, 0) // disk numbers
    putShortLE(out, n); putShortLE(out, n)
    putIntLE(out, cdBytes.length); putIntLE(out, cdOff)
    putShortLE(out, 0) // comment length
    out.toByteArray
  }

  final case class ZipEntryRow(shard_id: Long, doc_id: Long,
      entry_name: String, method: String, usize: Int, byte_sum: Long,
      deflate_smaller: Boolean)

  /** REAL ZIP walk, the reader's direction: find the EOCD from the
    * end (signature scan with the comment-length consistency check),
    * jump to the central directory, and for every CD entry verify the
    * local header AGREES (name/method/crc/sizes — the classic zip-
    * bomb/confusion surface), inflate or copy, then verify CRC32 and
    * the uncompressed size. Every divergence fails loud. */
  private[graft] def decodeZipShard(shardId: Long, bytes: Array[Byte])
      : Seq[ZipEntryRow] = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"zip shard $shardId: $why")
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Int =
      u16(off) | (u16(off + 2) << 16)
    // EOCD: scan back for the signature; comment length must match
    // the bytes that remain after it (strictness real readers need)
    var e = bytes.length - 22
    while (e >= 0 && u32(e) != 0x06054b50) e -= 1
    if (e < 0) fail("no EOCD record")
    if (e + 22 + u16(e + 20) != bytes.length)
      fail("EOCD comment length inconsistent")
    val nEntries = u16(e + 10)
    if (u16(e + 8) != nEntries) fail("disk/total entry counts differ")
    val cdSize = u32(e + 12)
    var pos = u32(e + 16)
    if (pos + cdSize != e) fail("central directory extent mismatch")
    val rows = Seq.newBuilder[ZipEntryRow]
    var i = 0
    while (i < nEntries) {
      if (u32(pos) != 0x02014b50) fail(s"bad CD signature at $pos")
      val method = u16(pos + 10)
      val crc = u32(pos + 16)
      val csize = u32(pos + 20)
      val usize = u32(pos + 24)
      val nameLen = u16(pos + 28)
      val extraLen = u16(pos + 30)
      val cmtLen = u16(pos + 32)
      val lfh = u32(pos + 42)
      val name = new String(bytes, pos + 46, nameLen, "US-ASCII")
      // local header must agree with the CD on every load-bearing field
      if (u32(lfh) != 0x04034b50) fail(s"bad LFH signature for $name")
      if (u16(lfh + 8) != method) fail(s"method mismatch for $name")
      if (u32(lfh + 14) != crc) fail(s"crc mismatch CD vs LFH for $name")
      if (u32(lfh + 18) != csize || u32(lfh + 22) != usize)
        fail(s"size mismatch CD vs LFH for $name")
      val lNameLen = u16(lfh + 26)
      val lExtraLen = u16(lfh + 28)
      if (new String(bytes, lfh + 30, lNameLen, "US-ASCII") != name)
        fail(s"name mismatch CD vs LFH for $name")
      val dStart = lfh + 30 + lNameLen + lExtraLen
      val packed = java.util.Arrays.copyOfRange(
        bytes, dStart, dStart + csize)
      val data = method match {
        case 0 =>
          if (csize != usize) fail(s"stored size mismatch for $name")
          packed
        case 8 =>
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(packed)
          val buf = new Array[Byte](usize)
          val m = inf.inflate(buf)
          if (m != usize || !inf.finished)
            fail(s"inflate size mismatch for $name")
          inf.end()
          buf
        case other => fail(s"unsupported method $other for $name")
      }
      val c = new java.util.zip.CRC32
      c.update(data)
      if (c.getValue.toInt != crc) fail(s"CRC32 mismatch for $name")
      if (!name.startsWith("doc") || !name.endsWith(".txt"))
        fail(s"unexpected entry name $name")
      val id = name.substring(3, name.length - 4).toLong
      var sum = 0L
      var j = 0
      while (j < data.length) { sum += data(j) & 0xff; j += 1 }
      rows += ZipEntryRow(shardId, id, name,
        if (method == 0) "stored" else "deflate", usize, sum,
        method == 8 && csize < usize)
      pos += 46 + nameLen + extraLen + cmtLen
      i += 1
    }
    rows.result()
  }

  /** q285's pipeline: 16-doc ZIP shards, decode via the central
    * directory with LFH cross-checks; shards are the parallelism
    * unit (one task per archive — how an unzip fleet scales). */
  def decodeZipShards(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(expr("doc_id div 16").as("shard_id"), col("doc_id"),
        col("text").cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val members = it.map(t => (t._2, t._3)).toSeq
        val rows = decodeZipShard(shard, encodeZipShard(members))
        val n = rows.length
        rows.map(r => (r.shard_id, r.doc_id, r.entry_name, r.method,
          r.usize, r.byte_sum, r.deflate_smaller, n))
      }
      .toDF("shard_id", "doc_id", "entry_name", "method", "usize",
        "byte_sum", "deflate_smaller", "n_entries")
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    // TFRecord shards — the TensorFlow training-data container:
    // length-word + masked-CRC32C framing (both CRCs verified on
    // read), in-band record ids, WebDataset-convention 32-doc
    // shards. The third container next to tar (q260) / WARC (q263).
    "q284_tfrecord_shards" -> ((s, d) =>
      decodeTfRecordShards(Tables.load(s, d, "documents"))),

    // ZIP archive walk — the dump format half of all public corpora
    // arrive in: EOCD scan, central-directory walk, LFH cross-check,
    // stored + raw-deflate entries, CRC32 verification. 16-doc
    // shards, one task per archive.
    "q285_zip_members" -> ((s, d) =>
      decodeZipShards(Tables.load(s, d, "documents"))),

    // MP3 metadata + frame walk — the dominant real-corpus audio
    // container: ID3v2.3 syncsafe tag grammar, TIT2 text frame, then
    // the MPEG-1 Layer III frame loop (bitrate table, padding-aware
    // lengths, strict sync). Completes the audio tier next to
    // WAV/μ-law/A-law/FLAC.
    "q290_mp3_meta" -> ((s, d) =>
      decodeMp3Files(Tables.load(s, d, "documents"))),

    // Protobuf wire-format walk — the serialization layer under
    // tf.Example/TFRecord: a generic tag/wire-type TLV walk across
    // all four wire types with carried-id, checksum and count
    // cross-checks. Completes the training-record story: q284 frames
    // records, q291 decodes what's inside them.
    "q291_proto_records" -> ((s, d) =>
      decodeProtoRecords(Tables.load(s, d, "documents"))),

    // Format sniffing — the ingest dispatcher for a MIXED binary
    // column: magic bytes (BMP/Ogg/ZIP/MP3), shape identification
    // (ICO's magic-less ICONDIR), and CRC verify-to-identify
    // (TFRecord), each hit validated by the format's real decoder.
    "q304_format_sniff" -> ((s, d) =>
      sniffFormats(Tables.load(s, d, "documents"))),

    // Modern image-crawl sniffing — WebP (RIFF/WEBP form type + the
    // VP8L 14-bit-dims header) and AVIF (ISO-BMFF ftyp-brand rule +
    // box walk) through the same q304 dispatcher.
    "q307_webp_avif_sniff" -> ((s, d) =>
      sniffModernImages(Tables.load(s, d, "documents"))),

    // Ogg page walk — the streaming-audio container (Vorbis/Opus
    // corpora): capture sync, 255-byte lacing with the 0-size final
    // segment rule, continuation/BOS/EOS flag discipline, page
    // sequence numbers, and the NON-zlib Ogg CRC32 recomputed per
    // page with the field zeroed.
    "q295_ogg_pages" -> ((s, d) =>
      decodeOggStreams(Tables.load(s, d, "documents"))),

    // ICO favicon walk — the container every web crawl hits on day
    // one: ICONDIR grammar, entry↔DIB cross-checks, the DOUBLED
    // height quirk enforced, XOR raster + all-transparent AND mask.
    "q302_ico_decode" -> ((s, d) =>
      decodeIcons(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_icons"), col("width"),
          col("height"), col("bpp"), col("ico_bytes"),
          round(col("mean_pixel"), 6).as("mean_pixel"),
          col("top_left_blue"))),

    // Near-duplicate IMAGE detection by perceptual hash — multimodal
    // dedup, the capability the text MinHash family can't give you.
    // The corpus has no natural duplicate images, so payloads are
    // PLANTED: each odd doc shares its even partner's payload (a
    // keyed self-join — at scale this is the upstream dedup-by-
    // content-id join). The hash is one generated codegen expression
    // (no decode loop needed for the HASH — it reads raster bytes
    // positionally), groups keyed by the 24-bit signature; group
    // rows are hash-keyed so the report shuffles |groups|, not
    // pixels.
    "q168_phash_dedup" -> ((s, d) => {
      // spread BEFORE the anchor self-join: the join broadcasts one
      // side, so the per-row phash expression evaluates in the probe
      // side's (spread) scan stage instead of one single-split task
      val docs = spread(Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text")))
      val pay = docs
        .select((col("doc_id") - col("doc_id") % 2).as("anchor"),
          col("doc_id"))
        .join(docs.select(col("doc_id").as("anchor"), col("text")),
          "anchor")
        .filter(length(col("text")) >= 12)
        .withColumn("h",
          expr("CAST(FLOOR(length(text) / 12.0) AS INT)"))
        .withColumn("phash", expr(phashSql("text", "h")))
      pay.groupBy("phash").agg(count(lit(1)).as("n"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .filter(col("n") >= 2)
        .orderBy(col("phash").asc)
    }),
    // Resize (stride subsample) keeps binary in/out; oracle recomputes
    // the sampled-byte stats from the string side.
    "q54_resize" -> ((s, d) => {
      resize(Tables.load(s, d, "documents"), stride = 3)
        .select(col("doc_id"), col("orig_bytes"), col("resized_bytes"),
          round(col("resized_mean"), 6).as("resized_mean"))
    }),

    // Frame sampling over binary payloads: every 4th 16-byte "frame".
    "q52_frame_sample" -> ((s, d) => {
      sampleFrames(Tables.load(s, d, "documents"), frameBytes = 16,
          stride = 4)
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"))
    }),

    // REAL decode + feature-extract over binary PPM payloads, then a
    // relational rollup of the extracted features (decode feeds
    // Catalyst land). The oracle recomputes the PPM geometry + raster
    // mean from the same text bytes — a parser bug in width/height/
    // header-size/mean shows up as a value mismatch.
    "q50_multimodal_decode" -> ((s, d) => {
      decodeImages(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"), round(col("mean_byte"), 6).as("mean_byte"))
    }),
    "q51_multimodal_agg" -> ((s, d) => {
      decodeImages(Tables.load(s, d, "documents"))
        .groupBy(floor(col("n_bytes") / 100).cast("int").as("size_bucket"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("mean_byte")), 6).as("avg_mean_byte"),
          max(col("height")).as("max_height"))
    }),

    // REAL audio decode (RIFF/WAVE PCM16 chunk walker) + per-asset
    // feature extraction — the audio twin of q50. The oracle
    // recomputes sample values, duration, peak and RMS from the same
    // text byte pairs, so an endianness or sign-extension bug in the
    // decoder is a value mismatch, not a silent drift.
    "q161_audio_decode" -> ((s, d) =>
      decodeAudio(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("sample_rate"),
          col("n_samples"), col("duration_us"), col("peak"),
          round(col("rms"), 6).as("rms"))),

    // REAL BMP decode (24-bit uncompressed, padded bottom-up rows) —
    // the second image container next to q50's netpbm. The oracle
    // recomputes geometry, the PIXEL-byte mean (pad bytes excluded)
    // and the top-left blue channel from the same text bytes: a
    // decoder that averages pad bytes or ignores the bottom-up row
    // order is a value mismatch, not a silent drift.
    "q183_bmp_decode" -> ((s, d) =>
      decodeImagesBmp(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("width"),
          col("height"), round(col("mean_pixel"), 6).as("mean_pixel"),
          col("top_left_blue"))),

    // REAL stereo 8-bit decode — the second audio format next to
    // q161's PCM16 mono, exercising the walker's channel interleave
    // and the PCM8 unsigned-to-centered conversion. The oracle
    // recomputes per-channel peak/RMS from the same alternating text
    // bytes: a decoder that swaps channels, sign-extends PCM8, or
    // counts flat samples as frames is a value mismatch.
    "q186_audio_stereo" -> ((s, d) =>
      decodeAudioStereo(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("sample_rate"),
          col("n_frames"), col("duration_us"), col("peak_l"),
          col("peak_r"), round(col("rms_l"), 6).as("rms_l"),
          round(col("rms_r"), 6).as("rms_r"))),

    // REAL GIF87a decode with full LZW decompression — the third
    // image container, and the first where the round-trip crosses
    // genuine compression (variable 9–12-bit codes, CLEAR resets,
    // KwKwK). The grayscale palette makes pixel index i ≡ payload
    // byte i, so the oracle recomputes geometry, mean index, top-left
    // index AND a position-weighted checksum from the raw bytes — an
    // LZW bug that shifts, drops or permutes pixels is a value
    // mismatch, not a silent drift.
    "q192_gif_decode" -> ((s, d) =>
      decodeImagesGif(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_index"), 6).as("mean_index"),
          col("top_left_index"), col("pos_sum"))),

    // REAL PNG decode — the fourth image container, crossing BOTH
    // zlib/DEFLATE compression (JVM Inflater, Adler-32 checked) and
    // per-scanline prediction (filter r % 5 cycles None/Sub/Up/
    // Average/Paeth), with CRC-32 verified on every chunk and
    // multi-IDAT concatenation. The oracle recomputes geometry, mean,
    // top-left and the position-weighted checksum from the raw bytes —
    // an inflate or inverse-filter bug is a value mismatch.
    "q196_png_decode" -> ((s, d) =>
      decodeImagesPng(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_gray"), 6).as("mean_gray"),
          col("top_left_gray"), col("pos_sum"))),

    // REAL truecolor PNG decode (color type 2) — the gray pipeline's
    // filters again, now over 3-byte pixels: the inverse predictors
    // must use the spec's bpp offset (left neighbor = same byte of
    // the previous PIXEL), and the oracle recomputes PER-CHANNEL
    // means from the byte stride — a decoder that treats the raster
    // as flat bytes passes gray but shifts every RGB channel mean.
    "q241_png_rgb_decode" -> ((s, d) =>
      decodeImagesPngRgb(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          col("top_left_r"), col("pos_sum"))),

    // REAL GIF decode with a LOCAL color table — the other legal
    // palette placement (per-image, in the descriptor): the fixture
    // carries NO global table, so a decoder that only knows the
    // global path fails loudly, and the 256-entry gray ramp is
    // verified entry-by-entry in BOTH variants (a palette-skipping
    // decoder can't pass by luck). Same LZW round-trip as q192.
    "q248_gif_lct_decode" -> ((s, d) =>
      decodeImagesGifLct(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_index"), 6).as("mean_index"),
          col("top_left_index"), col("pos_sum"))),

    // REAL RGBA PNG decode (color type 6) — the widest pixel (bpp 4)
    // the spec's byte-offset filter rule covers, with the alpha plane
    // audited as its own mean: a stride bug that reads alpha into a
    // color channel moves two means at once, and the bpp-offset
    // filters differ from BOTH the gray (1) and RGB (3) paths.
    "q243_png_rgba_decode" -> ((s, d) =>
      decodeImagesPngRgba(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("mean_a"), 6).as("mean_a"),
          col("top_left_r"), col("pos_sum"))),

    // REAL G.711 μ-law decode — the third audio format, and the first
    // COMPANDED one: payload bytes are the μ-law codes, the decoder
    // expands each through the published curve (complement, biased
    // segment/mantissa rebuild, bias out — pure integers, range
    // ±32124). The oracle replays the same expansion in SQL, so a
    // decoder that reads the bytes as PCM8 or botches a segment shift
    // is a value mismatch in peak/rms, not a silent drift.
    "q199_mulaw_decode" -> ((s, d) =>
      decodeAudioMulaw(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("sample_rate"),
          col("n_samples"), col("duration_us"), col("peak"),
          round(col("rms"), 6).as("rms"))),

    // HAMMING-BALL phash retrieval — q168 finds EXACT phash collisions;
    // real near-dup images differ by a few gradient bits. The serving
    // pattern for binary codes (multi-index pigeonhole hashing): split
    // the 24-bit phash into 4 disjoint 6-bit blocks — any pair within
    // Hamming distance 3 agrees EXACTLY on at least one block (4
    // blocks, at most 3 differing bits), so candidates are a blocked
    // equi-join on (block_id, block_value), never an all-pairs scan,
    // and the verify is one XOR popcount inside the join condition.
    // Candidate volume tracks block-bucket occupancy (the LSH-style
    // bound), recall is 1.0 by pigeonhole, and the oracle brute-forces
    // the same ball at test scale to prove it.
    "q259_phash_hamming" -> ((s, d) =>
      phashHammingPairs(Tables.load(s, d, "documents"), maxHamming = 3)),

    // WEBDATASET TAR SHARDS — how large multimodal training corpora
    // actually ship: N samples per POSIX ustar shard, read
    // sequentially per shard (shards ARE the parallelism unit). The
    // assembler is the fixture; the decoder is a real ustar parser
    // (octal fields, spaces-for-checksum rule, magic, block padding,
    // two-zero-block terminator) with per-member byte sums and exact
    // shard-size integrity columns the oracle recomputes from the
    // padding arithmetic: 512 + 512*ceil(len/512) per member + 1024.
    "q260_tar_shard_decode" -> ((s, d) =>
      decodeTarShards(Tables.load(s, d, "documents"))),

    // WARC/1.0 record walk — the OTHER crawl container (the one
    // CommonCrawl actually ships): 16-response files behind a
    // warcinfo record, strict CRLF framing, HTTP/1.1 blocks parsed
    // one level deeper with the body extent cross-checked against
    // the declared Content-Length. The byte-exact file_bytes and the
    // position-weighted body checksum fail any walker that is one
    // CRLF off — the failure mode that silently shears every record
    // after the first in a naive splitter.
    "q263_warc_decode" -> ((s, d) =>
      decodeWarcShards(Tables.load(s, d, "documents"))),

    // Gzipped WARC — q263 with every record its own RFC 1952 gzip
    // member (CommonCrawl's random-access layout): REAL deflate on
    // the wire, member boundaries found by inflating to exactly each
    // stream's end, per-member CRC32/ISIZE verified, then the same
    // strict WARC re-framing. One shard = one task — the reader
    // shape that scales to a crawl dump.
    "q268_warc_gz_decode" -> ((s, d) =>
      decodeWarcGzShards(Tables.load(s, d, "documents"))),

    // Permissive .warc.gz ingest — quarantine semantics: members
    // with a planted flipped deflate byte (doc_id % 7 == 3) are
    // counted and skipped via gzip-magic resync; every surviving
    // member still parses as strict WARC. The report is the
    // good/quarantined census the plant predicts exactly.
    "q269_warc_gz_permissive" -> ((s, d) =>
      decodeWarcGzPermissive(Tables.load(s, d, "documents"))),

    // Lake-codec interop matrix — zstd / lz4 / snappy round-trips of
    // a 4×-repeated payload through the exact libraries Spark's own
    // writers link; features come from the decompressed bytes, the
    // sameElements gate fails corruption loudly, and the repetition
    // makes the compressed-smaller bit deterministic for every
    // LZ-family codec.
    "q272_codec_matrix" -> ((s, d) =>
      codecMatrix(Tables.load(s, d, "documents"))),

    // EXIF metadata extraction — the walk every camera-image
    // pipeline runs before pixel work: APP1 → "Exif\0\0" → a full
    // TIFF parse INSIDE the segment (segment-relative offsets — the
    // classic EXIF bug), ASCII and RATIONAL types through the
    // value-or-offset rule, and the 0x8769 sub-IFD hop. Every field
    // derives from (doc_id, text length), so the oracle is pure
    // arithmetic + string formatting.
    "q273_exif_extract" -> ((s, d) =>
      extractExif(Tables.load(s, d, "documents"))),

    // Paletted PNG (color type 3) — the remaining common PNG pixel
    // layout: a PLTE chunk whose 256 entries are verified as the
    // gray identity ramp (the GIF-LCT discipline), raster bytes are
    // palette INDICES, and the chunk grammar enforces PLTE-before-
    // IDAT and paletted-implies-PLTE both ways.
    "q277_png_pal_decode" -> ((s, d) =>
      decodeImagesPngPal(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), col("n_palette"),
          round(col("mean_index"), 6).as("mean_index"),
          col("top_left_index"), col("pos_sum"))),

    // MP4 / ISO-BMFF metadata walk — the VIDEO container probe next
    // to tar/WARC (files) and EXIF/FLAC (image/audio metadata): box
    // headers incl. the 64-bit largesize form, container recursion
    // into moov, mvhd timescale/duration extraction. Completes the
    // container story across all three modalities.
    "q278_mp4_meta" -> ((s, d) =>
      extractMp4Meta(Tables.load(s, d, "documents"))),

    // FLAC STREAMINFO extraction — the audio twin of q273's EXIF
    // walk: metadata block grammar with the spec's byte-misaligned
    // 20/3/5/36-bit packed group, STREAMINFO-first enforced, PADDING
    // verified zero, unknown blocks skipped by length.
    "q276_flac_streaminfo" -> ((s, d) =>
      extractFlacInfo(Tables.load(s, d, "documents"))),

    // Animated GIF89a — the multi-image block grammar (GCE delays,
    // NETSCAPE looping, one LZW stream per frame) on top of the 87a
    // single-image fixtures; per-frame and whole-animation features
    // fail a decoder that drops, reorders, or mis-times a frame.
    "q274_gif_anim_decode" -> ((s, d) =>
      decodeGifAnimations(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_frames"), col("loop_count"),
          col("total_delay_cs"), col("n_pixels"),
          round(col("mean_index"), 6).as("mean_index"),
          round(col("first_frame_mean"), 6).as("first_frame_mean"),
          round(col("last_frame_mean"), 6).as("last_frame_mean"),
          col("pos_sum"))),

    // ADAM7-INTERLACED PNG — the spec's other pixel layout (the
    // progressive-rendering one real crawl corpora contain): seven
    // sub-image passes, each filtered AS ITS OWN IMAGE (pass-local
    // neighbors), scattered to the (x0 + i·dx, y0 + j·dy) grid of
    // table 8.2. Empty passes (width 4 leaves pass 2 with zero
    // columns) contribute no scanlines — the corner a
    // ceil-arithmetic bug hits first. Same oracle as q196: the final
    // raster is payload-identical, so every feature is closed-form.
    "q255_png_adam7_decode" -> ((s, d) =>
      decodeImagesPngAdam7(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_pixels"), round(col("mean_gray"), 6).as("mean_gray"),
          col("top_left_gray"), col("pos_sum"))),

    // REAL G.711 A-law decode — the OTHER companding curve (format
    // tag 6, the E1/European telephony standard the μ-law q199 tier
    // lacks): codes expand through the published 0x55-toggle +
    // segment/mantissa rebuild, with the A-law-specific corners —
    // linear segment 0, the inverted sign convention (bit set =
    // positive), range ±32256. The oracle replays the same integer
    // algebra in SQL; decoding through the μ-law curve (or as PCM8)
    // moves EVERY sample value and fails peak/rms loudly.
    "q256_alaw_decode" -> ((s, d) =>
      decodeAudioAlaw(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("sample_rate"),
          col("n_samples"), col("duration_us"), col("peak"),
          round(col("rms"), 6).as("rms"))),

    // REAL baseline JPEG decode (T.81 sequential DCT) — the highest-
    // frequency real-corpus image format: full marker walk, Annex K
    // Huffman tables rebuilt canonically, DC diff + AC run-length
    // entropy decode (two ZRLs per planted coefficient), dequant,
    // separable IDCT, YCbCr->RGB on neutral chroma. The fixture sits
    // on the codec's exact points (flat DC + the rational (4,4)
    // basis), so the oracle recomputes every feature from the raw
    // bytes in closed form — a decoder that misses the AC term zeroes
    // mean_amp, one that botches chroma moves mean_r and mean_b.
    "q251_jpeg_decode" -> ((s, d) =>
      decodeImagesJpeg(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_blocks"), col("n_pixels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("mean_amp"), 6).as("mean_amp"),
          col("top_left_r"), col("dc_checksum"))),

    // REAL baseline TIFF decode — the scanned-document / print-
    // pipeline container the tier lacks: IFD entry walk (ascending
    // tag order ENFORCED), SHORT/LONG fields through the spec's
    // value-or-offset rule (strip arrays go out-of-line the moment
    // count×4 > 4 — the fixture population exercises both
    // placements), multi-strip raster (RowsPerStrip 2) re-assembled
    // in declared order. The 1-based position checksum fails any
    // decoder that walks strips out of order; the byte-exact n_bytes
    // fails one that sizes the IFD or the external arrays wrong.
    "q262_tiff_decode" -> ((s, d) =>
      decodeImagesTiff(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("n_bytes"), col("width"),
          col("height"), col("n_strips"), col("n_pixels"),
          round(col("mean_gray"), 6).as("mean_gray"),
          col("top_left_gray"), col("pos_sum"))),

    // REAL 4:2:0 JPEG decode — the chroma-subsampled MCU layout
    // (Y 2×2 + Cb/Cr 1×1) that virtually every real-corpus JPEG
    // uses, on top of q251's 4:4:4 machinery: four interleaved luma
    // blocks per MCU (quadrant means fail any block-order mistake)
    // and a per-MCU planted Cb whose raster-level B−R / G−R means
    // fail a wrong chroma upsample or YCbCr mix.
    "q267_jpeg420_decode" -> ((s, d) =>
      decodeImagesJpeg420(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("width"), col("height"),
          col("n_mcus"), col("n_pixels"),
          round(col("mean_y_tl"), 6).as("mean_y_tl"),
          round(col("mean_y_tr"), 6).as("mean_y_tr"),
          round(col("mean_y_bl"), 6).as("mean_y_bl"),
          round(col("mean_y_br"), 6).as("mean_y_br"),
          round(col("db_mean"), 6).as("db_mean"),
          round(col("dg_mean"), 6).as("dg_mean"),
          col("top_left_r")))
  )

  val oracles: Map[String, String] = Map(
    // q290: every frame feature is arithmetic in (doc_id + frame
    // index) — bitrate cycles the 9–13 table slice, padding
    // alternates, filler is the (id+f) mod 251 byte — and the ID3
    // size is digit arithmetic in doc_id
    "q290_mp3_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
        |      AS n,
        |    length(doc_id::VARCHAR)::INT AS dg
        |  FROM documents
        |)
        |SELECT doc_id, 'doc ' || doc_id AS title, n AS n_frames,
        |  (10 + 10 + 1 + 4 + dg)::INT AS id3_bytes,
        |  CAST(list_sum([(144000 * (CASE (doc_id + fi) % 5
        |      WHEN 0 THEN 128 WHEN 1 THEN 160 WHEN 2 THEN 192
        |      WHEN 3 THEN 224 ELSE 256 END)) // 44100
        |      + (doc_id + fi) % 2
        |    for fi in range(0, n::INT)]) AS BIGINT) AS audio_bytes,
        |  1152 * n AS total_samples,
        |  (1152 * n * 1000) // 44100 AS duration_ms,
        |  CAST(list_sum([CASE (doc_id + fi) % 5
        |      WHEN 0 THEN 128 WHEN 1 THEN 160 WHEN 2 THEN 192
        |      WHEN 3 THEN 224 ELSE 256 END
        |    for fi in range(0, n::INT)]) AS BIGINT)
        |    AS bitrate_kbps_sum,
        |  CAST(list_sum([((144000 * (CASE (doc_id + fi) % 5
        |      WHEN 0 THEN 128 WHEN 1 THEN 160 WHEN 2 THEN 192
        |      WHEN 3 THEN 224 ELSE 256 END)) // 44100
        |      + (doc_id + fi) % 2 - 4) * ((doc_id + fi) % 251)
        |    for fi in range(0, n::INT)]) AS BIGINT) AS payload_sum
        |FROM f""".stripMargin,

    // q304: fmt is the doc_id cycle; each format's feature is its
    // own established byte algebra (BMP/ICO first byte, Ogg/TFRecord
    // raw sums, ZIP's 4×-repeat, MP3's token-count frames). The ICO
    // branch carries the same h=0 guard as q302's oracle: decodeIco
    // returns top_left_blue=0 when the payload is under 9 bytes.
    // Corpus preconditions (hold on every generated sf, min doc 44
    // bytes): no empty text (q291's encodeProto requires ≥1 byte)
    // and no single token ≥128 chars (1-byte protobuf varint len).
    "q304_format_sniff" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS sm,
        |    len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
        |      AS n,
        |    ascii(text[1:1])::BIGINT AS b0,
        |    octet_length(encode(text))::BIGINT AS bl
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ogg'
        |    WHEN 2 THEN 'tfrecord' WHEN 3 THEN 'zip'
        |    WHEN 4 THEN 'mp3' ELSE 'ico' END AS fmt,
        |  CASE doc_id % 6 WHEN 0 THEN b0 WHEN 1 THEN sm
        |    WHEN 2 THEN sm WHEN 3 THEN 4 * sm WHEN 4 THEN n
        |    ELSE CASE WHEN bl < 9 THEN 0 ELSE b0 END END AS feature
        |FROM f""".stripMargin,

    // q307: both formats' decoded dims are closed-form (width
    // 1+bytes%1000, height 1+tokens%500) — webp re-derives them from
    // the VP8L packed header, avif from the meta/ispe chain; feature
    // = packed dims (webp) / mdat byte sum (avif)
    "q307_webp_avif_sniff" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS sm,
        |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS n,
        |    octet_length(encode(text))::BIGINT AS bl
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'webp' ELSE 'avif' END AS fmt,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN (1 + bl % 1000) * 100000 + 1 + n % 500
        |    ELSE sm END AS feature,
        |  (1 + bl % 1000)::BIGINT AS image_w,
        |  (1 + n % 500)::BIGINT AS image_h
        |FROM f""".stripMargin,

    // q302: q183's byte algebra at a 32-row cap plus the constant
    // ICO overhead (22 dir + 40 DIB + 12h XOR + 4h AND)
    "q302_ico_decode" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    least(octet_length(encode(text))::INT // 9, 32) AS h, text
        |  FROM documents
        |)
        |SELECT doc_id, 1 AS n_icons, 3 AS width, h AS height,
        |  24 AS bpp, (62 + 16 * h)::INT AS ico_bytes,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 9*h + 1)])
        |      ::DOUBLE / (9 * h) END, 6) AS mean_pixel,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_blue
        |FROM f""".stripMargin,

    // q295: lacing arithmetic — L bytes lace into L//255 + 1
    // segments (incl. the 0-size tail when 255 | L), 2 segments per
    // page, header overhead 27 + nsegs per page
    "q295_ogg_pages" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS l,
        |    octet_length(encode(text)) // 255 + 1 AS segs,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS byte_sum
        |  FROM documents
        |)
        |SELECT doc_id, (segs + 1) // 2 AS n_pages, segs AS n_segments,
        |  27 * ((segs + 1) // 2) + segs + l AS file_bytes,
        |  l AS payload_bytes, coalesce(byte_sum, 0) AS byte_sum
        |FROM f""".stripMargin,

    // q291: header bytes are varint-width arithmetic (1 byte per
    // 7-bit group — the CASE ladders), payload features are the
    // usual token/byte sums over lower(trim(text))
    "q291_proto_records" ->
      """WITH f AS (
        |  SELECT doc_id, lower(trim(text)) AS s,
        |    octet_length(encode(lower(trim(text))))::INT AS tb,
        |    string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents
        |)
        |SELECT doc_id, 5 AS n_fields,
        |  (17 + tb + len(t)
        |   + CASE WHEN doc_id < 128 THEN 1 WHEN doc_id < 16384 THEN 2
        |       WHEN doc_id < 2097152 THEN 3
        |       WHEN doc_id < 268435456 THEN 4 ELSE 5 END
        |   + CASE WHEN tb < 128 THEN 1 WHEN tb < 16384 THEN 2
        |       ELSE 3 END
        |   + CASE WHEN len(t) < 128 THEN 1 WHEN len(t) < 16384 THEN 2
        |       ELSE 3 END)::INT AS msg_bytes,
        |  tb AS text_bytes, len(t)::INT AS n_tokens,
        |  CAST(list_sum([length(x) for x in t]) AS BIGINT)
        |    AS packed_sum,
        |  CAST(list_sum([ascii(s[i:i]) for i in range(1, tb + 1)])
        |    AS BIGINT) AS checksum
        |FROM f""".stripMargin,

    // q284: payload is "<id>\n<text>", so every size column is digit
    // arithmetic in doc_id plus the text byte length; byte_sum covers
    // the TEXT part only (the bytes that flow through both CRCs)
    "q284_tfrecord_shards" ->
      """WITH f AS (
        |  SELECT doc_id, doc_id // 32 AS shard_id,
        |    octet_length(encode(text))::INT AS tb,
        |    length(doc_id::VARCHAR)::INT AS db,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS byte_sum
        |  FROM documents
        |), s AS (
        |  SELECT shard_id, count(*)::INT AS n_records,
        |    CAST(sum(16 + db + 1 + tb) AS BIGINT) AS file_bytes
        |  FROM f GROUP BY 1
        |)
        |SELECT shard_id, doc_id, (16 + db + 1 + tb)::INT AS record_bytes,
        |  (db + 1 + tb)::INT AS payload_bytes, tb AS text_bytes,
        |  coalesce(byte_sum, 0) AS byte_sum, n_records, file_bytes
        |FROM f JOIN s USING (shard_id) ORDER BY doc_id""".stripMargin,

    // q285: the 4×-repeated payload makes usize/byte_sum pure text
    // arithmetic and deflate_smaller deterministic (q272's trick);
    // method alternates on doc_id parity
    "q285_zip_members" ->
      """WITH f AS (
        |  SELECT doc_id, doc_id // 16 AS shard_id,
        |    4 * octet_length(encode(text)) AS usize,
        |    4 * CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS byte_sum
        |  FROM documents
        |), s AS (
        |  SELECT shard_id, count(*)::INT AS n_entries FROM f GROUP BY 1
        |)
        |SELECT shard_id, doc_id, 'doc' || doc_id || '.txt' AS entry_name,
        |  CASE WHEN doc_id % 2 = 0 THEN 'stored' ELSE 'deflate' END
        |    AS method,
        |  usize::INT AS usize, coalesce(byte_sum, 0) AS byte_sum,
        |  doc_id % 2 = 1 AS deflate_smaller, n_entries
        |FROM f JOIN s USING (shard_id) ORDER BY doc_id""".stripMargin,

    "q168_phash_dedup" ->
      s"""WITH pay AS (
         |  SELECT a.doc_id AS doc_id, b.text AS text,
         |    CAST(FLOOR(length(b.text) / 12.0) AS INT) AS h
         |  FROM documents a JOIN documents b
         |    ON b.doc_id = a.doc_id - a.doc_id % 2
         |  WHERE length(b.text) >= 12
         |), ph AS (
         |  SELECT doc_id, ${phashSql("text", "h")} AS phash FROM pay
         |)
         |SELECT phash, count(*) AS n, min(doc_id) AS min_doc,
         |  max(doc_id) AS max_doc
         |FROM ph GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY phash""".stripMargin,
    "q54_resize" ->
      """WITH f AS (
        |  SELECT doc_id, len(text) AS n,
        |    [ascii(text[i+1:i+1]) for i in range(0, len(text), 3)] AS sampled
        |  FROM documents
        |)
        |SELECT doc_id, n AS orig_bytes, len(sampled) AS resized_bytes,
        |  round(list_sum(sampled)::DOUBLE / len(sampled), 6) AS resized_mean
        |FROM f""".stripMargin,
    "q52_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, len(text) AS n,
        |    unnest([i for i in range(0, len(text) // 16)]) AS frame_idx
        |  FROM documents
        |)
        |SELECT doc_id, frame_idx, 16 AS frame_bytes,
        |  round(list_sum([ascii(text[frame_idx*16 + j : frame_idx*16 + j])
        |    for j in range(1, 17)])::DOUBLE / 16, 6) AS mean_byte
        |FROM f JOIN documents USING (doc_id)
        |WHERE frame_idx % 4 = 0""".stripMargin,
    // documents text is ASCII, so utf-8 byte i == code point of char i —
    // the oracle recomputes the PPM fixture's geometry (width 4,
    // height = n/12, header "P6\n4 {h}\n255\n" = 10+digits(h) bytes)
    // and the raster mean (first h*12 text bytes) from the string side;
    // the engine side must recover exactly these via the REAL parser.
    "q50_multimodal_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 12 AS h, text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  10 + length(CAST(h AS VARCHAR))::INT + 12 * h AS n_bytes,
        |  4 AS width, h AS height, 3 AS channels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 12*h + 1)])::DOUBLE
        |      / (12 * h) END, 6) AS mean_byte
        |FROM f""".stripMargin,
    "q51_multimodal_agg" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 12 AS h,
        |    octet_length(encode(text))::INT AS n, text
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    10 + length(CAST(h AS VARCHAR))::INT + 12 * h AS n_bytes, h,
        |    CASE WHEN h = 0 THEN 0.0 ELSE
        |      list_sum([ascii(text[i:i]) for i in range(1, 12*h + 1)])::DOUBLE
        |        / (12 * h) END AS mean_byte
        |  FROM f
        |)
        |SELECT floor(n_bytes / 100)::INT AS size_bucket, count(*) AS n,
        |  round(avg(mean_byte), 6) AS avg_mean_byte,
        |  max(h) AS max_height
        |FROM g GROUP BY 1""".stripMargin,
    // the WAV fixture packs text byte pair (2i, 2i+1) big-endian into
    // signed sample i, written little-endian per the WAV spec; header
    // is the canonical 44 bytes. The oracle recomputes every feature
    // from the string side — sign wrap included.
    "q161_audio_decode" ->
      """WITH s AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT // 2 AS ns,
        |    text
        |  FROM documents
        |), v AS (
        |  SELECT doc_id, ns,
        |    [CASE WHEN ascii(text[2*i+1:2*i+1]) * 256
        |        + ascii(text[2*i+2:2*i+2]) >= 32768
        |      THEN ascii(text[2*i+1:2*i+1]) * 256
        |        + ascii(text[2*i+2:2*i+2]) - 65536
        |      ELSE ascii(text[2*i+1:2*i+1]) * 256
        |        + ascii(text[2*i+2:2*i+2]) END
        |     for i in range(0, ns)] AS smp
        |  FROM s
        |)
        |SELECT doc_id, (44 + 2 * ns)::INT AS n_bytes,
        |  8000 AS sample_rate, ns AS n_samples,
        |  ns * 1000000 // 8000 AS duration_us,
        |  CASE WHEN ns = 0 THEN 0 ELSE
        |    list_max(list_transform(smp, x -> abs(x)))::INT END AS peak,
        |  CASE WHEN ns = 0 THEN 0.0 ELSE
        |    round(sqrt(list_sum(list_transform(smp, x -> x * x))::DOUBLE
        |      / ns), 6) END AS rms
        |FROM v""".stripMargin,
    // the BMP fixture: width 3 (stride 12 = 9 pixel bytes + 3 pad),
    // h = len/9 full rows, 54-byte header, bottom-up storage. Pad
    // bytes are zero and EXCLUDED from the mean; the top-left pixel's
    // blue byte is payload byte 0 (image row 0 = LAST stored row).
    "q183_bmp_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 9 AS h, text
        |  FROM documents
        |)
        |SELECT doc_id, (54 + 12 * h)::INT AS n_bytes,
        |  3 AS width, h AS height,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 9*h + 1)])::DOUBLE
        |      / (9 * h) END, 6) AS mean_pixel,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_blue
        |FROM f""".stripMargin,
    // the stereo fixture stores payload byte pair (2i, 2i+1) verbatim
    // as the UNSIGNED 8-bit (L, R) samples of frame i; the decoder
    // re-centers to value - 128. Header is the canonical 44 bytes at
    // 11025 Hz, block align 2.
    "q186_audio_stereo" ->
      """WITH s AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT // 2 AS nf,
        |    text
        |  FROM documents
        |), v AS (
        |  SELECT doc_id, nf,
        |    [ascii(text[2*i+1:2*i+1]) - 128 for i in range(0, nf)] AS lch,
        |    [ascii(text[2*i+2:2*i+2]) - 128 for i in range(0, nf)] AS rch
        |  FROM s
        |)
        |SELECT doc_id, (44 + 2 * nf)::INT AS n_bytes,
        |  11025 AS sample_rate, nf AS n_frames,
        |  nf * 1000000 // 11025 AS duration_us,
        |  CASE WHEN nf = 0 THEN 0 ELSE
        |    list_max(list_transform(lch, x -> abs(x)))::INT END AS peak_l,
        |  CASE WHEN nf = 0 THEN 0 ELSE
        |    list_max(list_transform(rch, x -> abs(x)))::INT END AS peak_r,
        |  CASE WHEN nf = 0 THEN 0.0 ELSE
        |    round(sqrt(list_sum(list_transform(lch, x -> x * x))::DOUBLE
        |      / nf), 6) END AS rms_l,
        |  CASE WHEN nf = 0 THEN 0.0 ELSE
        |    round(sqrt(list_sum(list_transform(rch, x -> x * x))::DOUBLE
        |      / nf), 6) END AS rms_r
        |FROM v""".stripMargin,
    // the GIF fixture: width 4, h = len/4 full rows, grayscale
    // palette => pixel index i = payload byte i; geometry, mean,
    // top-left and the position-weighted checksum all recomputed from
    // the same bytes the engine LZW-round-trips
    "q192_gif_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 4 AS h, text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 4*h + 1)])::DOUBLE
        |      / (4 * h) END, 6) AS mean_index,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_index,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 4*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,
    // q248: identical payload-derived statistics — the palette moved,
    // the pixel indexes didn't
    "q248_gif_lct_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 4 AS h, text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 4*h + 1)])::DOUBLE
        |      / (4 * h) END, 6) AS mean_index,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_index,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 4*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,
    // the PNG fixture: width 4, h = len/4 full rows, grayscale 8-bit
    // => pixel i = payload byte i; geometry, mean, top-left and the
    // position-weighted checksum recomputed from the same bytes the
    // engine zlib-round-trips and unfilters
    // q267: MCU i's four quadrant lumas are 36 + b%184 of payload
    // bytes 5i..5i+3 (R == Y since Cr is neutral), and its flat Cb
    // offset is b%41 − 20 of byte 5i+4, so B−R and G−R are
    // round(±factor·cbOff) per pixel — closed form per MCU; the
    // domain sweep in MultimodalSpec proves no ±0.5 boundary exists,
    // so DuckDB's half-away round and the JVM's half-up agree
    "q267_jpeg420_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 5 AS nm,
        |    text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN nm = 0 THEN 0 ELSE 16 END AS width,
        |  (16 * nm)::INT AS height,
        |  nm::BIGINT AS n_mcus, (256 * nm)::BIGINT AS n_pixels,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE
        |    list_sum([36 + ascii(text[5*i+1:5*i+1]) % 184
        |      for i in range(0, nm)])::DOUBLE / nm END, 6) AS mean_y_tl,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE
        |    list_sum([36 + ascii(text[5*i+2:5*i+2]) % 184
        |      for i in range(0, nm)])::DOUBLE / nm END, 6) AS mean_y_tr,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE
        |    list_sum([36 + ascii(text[5*i+3:5*i+3]) % 184
        |      for i in range(0, nm)])::DOUBLE / nm END, 6) AS mean_y_bl,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE
        |    list_sum([36 + ascii(text[5*i+4:5*i+4]) % 184
        |      for i in range(0, nm)])::DOUBLE / nm END, 6) AS mean_y_br,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE
        |    list_sum([round(1.772 * (ascii(text[5*i+5:5*i+5]) % 41 - 20))
        |      for i in range(0, nm)])::DOUBLE / nm END, 6) AS db_mean,
        |  round(CASE WHEN nm = 0 THEN 0.0 ELSE
        |    list_sum([round(-0.344136 * (ascii(text[5*i+5:5*i+5]) % 41
        |      - 20)) for i in range(0, nm)])::DOUBLE / nm END, 6)
        |    AS dg_mean,
        |  CASE WHEN nm = 0 THEN 0
        |    ELSE 36 + ascii(text[1:1]) % 184 END AS top_left_r
        |FROM f""".stripMargin,

    // the TIFF fixture: width 5, h = len/5 full rows, ns = ceil(h/2)
    // strips of 2 rows; file size is closed-form (8 header + 5h
    // raster + 114 IFD + the external offset/count arrays only when
    // ns > 1); mean/top-left/pos_sum recompute from the same payload
    // bytes the engine round-trips through the strip walk
    "q262_tiff_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 5 AS h,
        |    text
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, h, (h + 1) // 2 AS ns, text FROM f
        |)
        |SELECT doc_id,
        |  (122 + 5 * h +
        |    CASE WHEN ns > 1 THEN 8 * ns ELSE 0 END)::INT AS n_bytes,
        |  5 AS width, h AS height, ns AS n_strips,
        |  (5 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 5*h + 1)])::DOUBLE
        |      / (5 * h) END, 6) AS mean_gray,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_gray,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 5*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM g""".stripMargin,
    "q196_png_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 4 AS h, text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 4*h + 1)])::DOUBLE
        |      / (4 * h) END, 6) AS mean_gray,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_gray,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 4*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,
    // q260: members recompute from the text bytes; shard size is pure
    // padding arithmetic
    "q260_tar_shard_decode" ->
      """WITH f AS (
        |  SELECT doc_id, doc_id // 32 AS shard_id,
        |    octet_length(encode(text))::INT AS member_bytes,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS byte_sum
        |  FROM documents
        |), s AS (
        |  SELECT shard_id, count(*)::INT AS n_members,
        |    CAST(sum(512 + 512 * ((member_bytes + 511) // 512)) + 1024
        |      AS BIGINT) AS shard_bytes
        |  FROM f GROUP BY 1
        |)
        |SELECT shard_id, doc_id, member_bytes,
        |  coalesce(byte_sum, 0) AS byte_sum, n_members, shard_bytes
        |FROM f JOIN s USING (shard_id) ORDER BY doc_id""".stripMargin,

    // q274: frame f carries payload bytes [8f, 8f+8); its GCE delay
    // is 1 + byte(8f) % 100; loop = id % 5 — every animation feature
    // is byte arithmetic over the same slices the frames LZW-carry
    "q274_gif_anim_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 8 AS nf,
        |    text
        |  FROM documents
        |  WHERE octet_length(encode(text)) >= 8
        |)
        |SELECT doc_id, nf AS n_frames, (doc_id % 5)::INT AS loop_count,
        |  CAST(list_sum([1 + ascii(text[8*i+1:8*i+1]) % 100
        |    for i in range(0, nf)]) AS BIGINT) AS total_delay_cs,
        |  (8 * nf)::BIGINT AS n_pixels,
        |  round(list_sum([ascii(text[i:i])
        |    for i in range(1, 8*nf + 1)])::DOUBLE / (8 * nf), 6)
        |    AS mean_index,
        |  round(list_sum([ascii(text[i:i])
        |    for i in range(1, 9)])::DOUBLE / 8, 6) AS first_frame_mean,
        |  round(list_sum([ascii(text[i:i])
        |    for i in range(8*nf - 7, 8*nf + 1)])::DOUBLE / 8, 6)
        |    AS last_frame_mean,
        |  CAST(list_sum([i * ascii(text[i:i])
        |    for i in range(1, 8*nf + 1)]) AS BIGINT) AS pos_sum
        |FROM f""".stripMargin,

    // q278: mvhd fields are (doc_id, length) arithmetic at timescale
    // 1000; the free box carries len%64 bytes through the largesize
    // form; the box census is the fixture's constant 4
    "q278_mp4_meta" ->
      """SELECT doc_id, 4 AS n_boxes, 'isom' AS brand,
        |  1000::BIGINT AS timescale,
        |  (40 * length(text) + doc_id % 40)::BIGINT AS duration_units,
        |  (40 * length(text) + doc_id % 40)::BIGINT AS duration_ms,
        |  (2 + doc_id % 5)::BIGINT AS next_track_id,
        |  (length(text) % 64)::BIGINT AS free_bytes
        |FROM documents""".stripMargin,

    // q277: identity palette ⇒ index i == payload byte i — q196's
    // byte algebra at width 4 plus the constant palette size
    "q277_png_pal_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 4 AS h,
        |    text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels, 256 AS n_palette,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 4*h + 1)])::DOUBLE
        |      / (4 * h) END, 6) AS mean_index,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_index,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 4*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,

    // q276: every STREAMINFO field is (doc_id, length) arithmetic —
    // total = 100·len + id%37 at 44100 Hz, channels = 1 + id%2,
    // padding = len%50; duration is integer micros
    "q276_flac_streaminfo" ->
      """SELECT doc_id, 44100 AS sample_rate,
        |  (1 + doc_id % 2)::INT AS channels, 16 AS bits_per_sample,
        |  (length(text) * 100 + doc_id % 37)::BIGINT AS total_samples,
        |  ((length(text) * 100 + doc_id % 37) * 1000000 // 44100
        |    )::BIGINT AS duration_us,
        |  14 AS min_frame_size,
        |  (14 + length(text) % 100)::INT AS max_frame_size,
        |  2 AS n_blocks,
        |  (length(text) % 50)::BIGINT AS padding_bytes
        |FROM documents""".stripMargin,

    // q273: orientation = 1 + id%8; datetime seconds = id·7 % 60;
    // exposure = 1/(1 + len%1000); pixel_x = len — all id/length
    // arithmetic, the tag counts are the fixture's constants
    "q273_exif_extract" ->
      """SELECT doc_id,
        |  (1 + doc_id % 8)::INT AS orientation,
        |  '2026:08:15 12:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
        |    || ':' || lpad(CAST(doc_id * 7 % 60 AS VARCHAR), 2, '0')
        |    AS datetime,
        |  1::BIGINT AS exposure_num,
        |  (1 + length(text) % 1000)::BIGINT AS exposure_den,
        |  length(text)::BIGINT AS pixel_x,
        |  3 AS n_ifd0_tags, 2 AS n_exif_tags
        |FROM documents""".stripMargin,

    // q272: the 4×-repeat makes the checksum a closed form of the
    // single-copy sums — Σ_{k=0..3} Σ_j (kn+j)·b_j = 4·Σ j·b_j +
    // 6n·Σ b_j — and guarantees the smaller-bit for any LZ codec
    "q272_codec_matrix" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS n, text
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, 4 * n AS orig_bytes,
        |    CASE WHEN n = 0 THEN 0 ELSE
        |      4 * CAST(list_sum([i * ascii(text[i:i])
        |        for i in range(1, CAST(n AS INT) + 1)]) AS BIGINT)
        |      + 6 * n * CAST(list_sum([ascii(text[i:i])
        |        for i in range(1, CAST(n AS INT) + 1)]) AS BIGINT)
        |    END AS checksum,
        |    n
        |  FROM d
        |)
        |SELECT f.doc_id, c.codec, f.orig_bytes, f.checksum,
        |  f.n > 24 AS roundtrip_smaller
        |FROM f CROSS JOIN (
        |  SELECT unnest(['zstd', 'lz4', 'snappy']) AS codec) c
        |ORDER BY f.doc_id, c.codec""".stripMargin,

    // q269: the plant corrupts exactly the doc_id % 7 == 3 members,
    // so the quarantine census is pure id arithmetic and the good
    // mass is q263's body arithmetic restricted to surviving docs
    "q269_warc_gz_permissive" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 16 AS shard_id,
        |    octet_length(encode(text))::BIGINT AS n, text,
        |    (doc_id % 7 = 3) AS corrupt
        |  FROM documents
        |)
        |SELECT shard_id,
        |  (1 + sum(CASE WHEN corrupt THEN 0 ELSE 1 END))::BIGINT
        |    AS n_good,
        |  sum(CASE WHEN corrupt THEN 1 ELSE 0 END)::BIGINT
        |    AS n_quarantined,
        |  sum(CASE WHEN corrupt THEN 0 ELSE n END)::BIGINT
        |    AS sum_body_bytes,
        |  sum(CASE WHEN corrupt THEN 0 ELSE
        |    CASE WHEN n = 0 THEN 0 ELSE CAST(list_sum(
        |      [i * ascii(text[i:i])
        |       for i in range(1, CAST(n AS INT) + 1)]) AS BIGINT) END
        |  END)::BIGINT AS sum_body_checksum
        |FROM d GROUP BY shard_id
        |ORDER BY shard_id""".stripMargin,

    // q268: compression is transparent to the features — the member
    // walk reproduces exactly q263's plaintext stream, so the oracle
    // is q263's record arithmetic (n_members = records; plain_bytes
    // = the uncompressed file size)
    "q268_warc_gz_decode" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 16 AS shard_id,
        |    octet_length(encode(text))::BIGINT AS n, text
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, shard_id, n, text,
        |    37 + length(CAST(n AS VARCHAR)) + n AS cl,
        |    length(CAST(doc_id AS VARCHAR)) AS di
        |  FROM d
        |), g AS (
        |  SELECT shard_id, (count(*) + 1)::BIGINT AS n_members,
        |    (149 + length(CAST(shard_id AS VARCHAR)) +
        |     sum(182 + 2 * di + length(CAST(cl AS VARCHAR)) + cl)
        |    )::BIGINT AS plain_bytes
        |  FROM r GROUP BY shard_id
        |)
        |SELECT r.shard_id, r.doc_id, 200 AS http_status,
        |  r.cl::BIGINT AS record_bytes, r.n AS body_bytes,
        |  CASE WHEN r.n = 0 THEN 0 ELSE CAST(list_sum(
        |    [i * ascii(r.text[i:i])
        |     for i in range(1, CAST(r.n AS INT) + 1)])
        |    AS BIGINT) END AS body_checksum,
        |  g.n_members, g.plain_bytes
        |FROM r JOIN g USING (shard_id)
        |ORDER BY r.doc_id""".stripMargin,

    // q263: every WARC record size is closed-form in (doc_id, body
    // length) — 182 + 2·digits(id) + digits(cl) + cl per response,
    // 149 + digits(shard) for the warcinfo — so the file size is a
    // group sum; the body checksum recomputes from the same text
    // bytes the engine frames through HTTP inside WARC
    "q263_warc_decode" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 16 AS shard_id,
        |    octet_length(encode(text))::BIGINT AS n, text
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, shard_id, n, text,
        |    37 + length(CAST(n AS VARCHAR)) + n AS cl,
        |    length(CAST(doc_id AS VARCHAR)) AS di
        |  FROM d
        |), g AS (
        |  SELECT shard_id, (count(*) + 1)::BIGINT AS n_records,
        |    (149 + length(CAST(shard_id AS VARCHAR)) +
        |     sum(182 + 2 * di + length(CAST(cl AS VARCHAR)) + cl)
        |    )::BIGINT AS file_bytes
        |  FROM r GROUP BY shard_id
        |)
        |SELECT r.shard_id, r.doc_id,
        |  'https://example.com/doc/' || CAST(r.doc_id AS VARCHAR)
        |    AS target_uri,
        |  200 AS http_status,
        |  r.cl::BIGINT AS record_bytes, r.n AS body_bytes,
        |  CASE WHEN r.n = 0 THEN 0 ELSE CAST(list_sum(
        |    [i * ascii(r.text[i:i])
        |     for i in range(1, CAST(r.n AS INT) + 1)])
        |    AS BIGINT) END AS body_checksum,
        |  g.n_records, g.file_bytes
        |FROM r JOIN g USING (shard_id)
        |ORDER BY r.doc_id""".stripMargin,

    // q255: the interlaced stream reconstructs the SAME raster, so
    // the oracle is q196's byte algebra verbatim
    "q255_png_adam7_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 4 AS h, text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 4*h + 1)])::DOUBLE
        |      / (4 * h) END, 6) AS mean_gray,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_gray,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 4*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,

    // the truecolor fixture: payload byte i is raster channel byte i
    // (pixel i/3, channel i%3) at width 4, so h = len/12 and channel
    // c's mean strides the text bytes at offset c+1, step 3 — each
    // channel holds exactly 4h bytes
    "q241_png_rgb_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 12 AS h,
        |    text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 12*h + 1, 3)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_r,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(2, 12*h + 1, 3)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_g,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(3, 12*h + 1, 3)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_b,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_r,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 12*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,
    // the RGBA fixture: payload byte i is raster channel byte i
    // (pixel i/4, channel i%4) at width 4, so h = len/16 and channel
    // c's mean strides the text bytes at offset c+1, step 4
    "q243_png_rgba_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT // 16 AS h,
        |    text
        |  FROM documents
        |)
        |SELECT doc_id, 4 AS width, h AS height,
        |  (4 * h)::BIGINT AS n_pixels,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(1, 16*h + 1, 4)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_r,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(2, 16*h + 1, 4)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_g,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(3, 16*h + 1, 4)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_b,
        |  round(CASE WHEN h = 0 THEN 0.0 ELSE
        |    list_sum([ascii(text[i:i]) for i in range(4, 16*h + 1, 4)])
        |      ::DOUBLE / (4 * h) END, 6) AS mean_a,
        |  CASE WHEN h = 0 THEN 0 ELSE ascii(text[1:1]) END
        |    AS top_left_r,
        |  CASE WHEN h = 0 THEN 0 ELSE CAST(
        |    list_sum([i * ascii(text[i:i]) for i in range(1, 16*h + 1)])
        |    AS BIGINT) END AS pos_sum
        |FROM f""".stripMargin,
    // the μ-law fixture stores payload byte i verbatim as code i; the
    // oracle expands codes with the same G.711 integer algebra
    // (u = 255 - c, t = ((u%16)*8 + 132) << ((u//16)%8), ±(t - 132))
    "q199_mulaw_decode" ->
      """WITH s AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS ns, text
        |  FROM documents
        |), v AS (
        |  SELECT doc_id, ns,
        |    list_transform(
        |      [255 - ascii(text[i+1:i+1]) for i in range(0, ns)],
        |      u -> CASE WHEN u >= 128
        |        THEN 132 - ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))
        |        ELSE ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
        |        END) AS smp
        |  FROM s
        |)
        |SELECT doc_id, (44 + ns)::INT AS n_bytes,
        |  8000 AS sample_rate, ns AS n_samples,
        |  ns * 1000000 // 8000 AS duration_us,
        |  CASE WHEN ns = 0 THEN 0 ELSE
        |    list_max(list_transform(smp, x -> abs(x)))::INT END AS peak,
        |  CASE WHEN ns = 0 THEN 0.0 ELSE
        |    round(sqrt(list_sum(list_transform(smp, x -> x * x))::DOUBLE
        |      / ns), 6) END AS rms
        |FROM v""".stripMargin,

    // the A-law fixture stores payload byte i verbatim as code i; the
    // oracle expands codes with the same G.711 integer algebra
    // (a = xor(c, 85); seg = (a//16) % 8; t0 = (a%16)*16;
    //  t = seg 0 -> t0+8, seg 1 -> t0+264, else (t0+264)<<(seg-1);
    //  sign bit SET means positive — the inverse of μ-law)
    "q256_alaw_decode" ->
      """WITH s AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS ns, text
        |  FROM documents
        |), v AS (
        |  SELECT doc_id, ns,
        |    list_transform(
        |      [xor(ascii(text[i+1:i+1]), 85) for i in range(0, ns)],
        |      a -> CASE WHEN a >= 128 THEN 1 ELSE -1 END * (
        |        CASE (a // 16) % 8
        |          WHEN 0 THEN (a % 16) * 16 + 8
        |          WHEN 1 THEN (a % 16) * 16 + 264
        |          ELSE ((a % 16) * 16 + 264)
        |            * (1 << ((a // 16) % 8 - 1))
        |        END)) AS smp
        |  FROM s
        |)
        |SELECT doc_id, (44 + ns)::INT AS n_bytes,
        |  8000 AS sample_rate, ns AS n_samples,
        |  ns * 1000000 // 8000 AS duration_us,
        |  CASE WHEN ns = 0 THEN 0 ELSE
        |    list_max(list_transform(smp, x -> abs(x)))::INT END AS peak,
        |  CASE WHEN ns = 0 THEN 0.0 ELSE
        |    round(sqrt(list_sum(list_transform(smp, x -> x * x))::DOUBLE
        |      / ns), 6) END AS rms
        |FROM v""".stripMargin,

    // q259: the oracle brute-forces the Hamming ball over the same
    // generated phash SQL — equality of the two sets IS the pigeonhole
    // guarantee (<= 3 differing bits cannot dodge all 4 blocks)
    "q259_phash_hamming" -> {
      s"""WITH p AS (
        |  SELECT doc_id, ${phashSql("text", "h")} AS phash
        |  FROM (SELECT doc_id, text,
        |          CAST(FLOOR(length(text) / 12.0) AS INT) AS h
        |        FROM documents WHERE length(text) >= 12)
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  bit_count(xor(a.phash, b.phash))::INT AS hamming
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY a_id, b_id""".stripMargin
    },

    // the JPEG fixture: byte pair (2i-1, 2i) -> block i with flat DC
    // v_i = 8 + b1 % 240 and amplitude d_i = b2 % 8 — decoded pixels
    // are exactly v_i +- d_i (the (4,4) basis is rational), chroma is
    // neutral so R = G = B; every feature is closed-form integer
    // algebra on the raw bytes (list_sum over BIGINTs — order-safe)
    "q251_jpeg_decode" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT // 2 AS nb,
        |    text
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, nb,
        |    [8 + ascii(text[2*i-1:2*i-1]) % 240
        |      for i in range(1, nb + 1)] AS v,
        |    [ascii(text[2*i:2*i]) % 8 for i in range(1, nb + 1)] AS d
        |  FROM f
        |)
        |SELECT doc_id,
        |  CASE WHEN nb = 0 THEN 0 ELSE 8 END AS width,
        |  (8 * nb)::INT AS height,
        |  nb AS n_blocks, (64 * nb)::BIGINT AS n_pixels,
        |  round(CASE WHEN nb = 0 THEN 0.0 ELSE
        |    list_sum(v)::DOUBLE / nb END, 6) AS mean_r,
        |  round(CASE WHEN nb = 0 THEN 0.0 ELSE
        |    list_sum(v)::DOUBLE / nb END, 6) AS mean_g,
        |  round(CASE WHEN nb = 0 THEN 0.0 ELSE
        |    list_sum(v)::DOUBLE / nb END, 6) AS mean_b,
        |  round(CASE WHEN nb = 0 THEN 0.0 ELSE
        |    list_sum(d)::DOUBLE / nb END, 6) AS mean_amp,
        |  CASE WHEN nb = 0 THEN 0 ELSE v[1] + d[1] END AS top_left_r,
        |  CASE WHEN nb = 0 THEN 0 ELSE CAST(
        |    list_sum([i * v[i] for i in range(1, nb + 1)]) AS BIGINT)
        |    END AS dc_checksum
        |FROM b""".stripMargin
  )
}
