package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** The REAL netpbm decode behind q50/q51: header/raster parsing pinned
  * against hand-built payloads (including the format corners the
  * fixture encoder never emits — comments, P5, malformed rasters), and
  * the end-to-end encode→decode identity over real document text. */
class MultimodalSpec extends SparkSpecBase {

  private def ppm(header: String, raster: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ raster

  test("P6 decode recovers dims, channels, byte count, raster mean") {
    val raster = Array.tabulate(2 * 3 * 3)(i => (i * 10).toByte) // 2x3 RGB
    val d = MultimodalOps.decodeNetpbm(7L, ppm("P6\n2 3\n255\n", raster))
    assert(d.doc_id == 7L && d.width == 2 && d.height == 3
      && d.channels == 3)
    assert(d.n_bytes == 11 + raster.length)
    val want = raster.map(_ & 0xff).sum.toDouble / raster.length
    assert(math.abs(d.mean_byte - want) < 1e-12)
  }

  test("P5 grayscale and header comments parse per the spec") {
    val raster = Array[Byte](10, 20, 30, 40, 50, 60) // 3x2 gray
    val bytes = ppm("P5\n# a comment\n3 2\n# another\n255\n", raster)
    val d = MultimodalOps.decodeNetpbm(1L, bytes)
    assert(d.width == 3 && d.height == 2 && d.channels == 1)
    assert(math.abs(d.mean_byte - 35.0) < 1e-12)
  }

  test("zero-height image decodes to an empty raster, mean 0") {
    val d = MultimodalOps.decodeNetpbm(2L, ppm("P6\n4 0\n255\n",
      Array.empty[Byte]))
    assert(d.width == 4 && d.height == 0 && d.mean_byte == 0.0)
  }

  test("malformed payloads FAIL (no fabricated pixels)") {
    // truncated raster: 2x2 RGB needs 12 bytes, has 5
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeNetpbm(3L, ppm("P6\n2 2\n255\n",
        Array[Byte](1, 2, 3, 4, 5)))
    }
    // 16-bit maxval (2-byte samples) is unsupported, must not misparse
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeNetpbm(4L, ppm("P6\n1 1\n65535\n",
        Array[Byte](0, 0, 0, 0, 0, 0)))
    }
    // wrong magic
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeNetpbm(5L, ppm("P3\n1 1\n255\n",
        Array[Byte](0, 0, 0)))
    }
    // truncated header
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeNetpbm(6L, "P6\n2".getBytes("US-ASCII"))
    }
  }

  test("BMP decode: pad bytes excluded from mean; bottom-up top-left pinned") {
    // payload = 2 image rows of 9 pixel bytes each
    val payload = Array.tabulate(18)(i => (i + 1).toByte)
    val bmp = MultimodalOps.encodeBmp(payload)
    assert(bmp.length == 54 + 2 * 12)
    val d = MultimodalOps.decodeBmp(9L, bmp)
    assert(d.width == 3 && d.height == 2 && d.n_bytes == 78)
    // mean over the 18 PIXEL bytes only — the 6 zero pad bytes would
    // drag a naive all-raster mean down to 171/24
    val want = payload.map(_ & 0xff).sum.toDouble / 18
    assert(math.abs(d.mean_pixel - want) < 1e-12)
    // top-left pixel = image row 0 = LAST stored row; blue = byte 0
    assert(d.top_left_blue == 1,
      "decoder must honor bottom-up row order")
  }

  test("BMP top-down (negative height) also decodes; row order flips") {
    val payload = Array.tabulate(18)(i => (i + 1).toByte)
    val bmp = MultimodalOps.encodeBmp(payload)
    // flip the height field (offset 22, i32 LE) to -2: top-down layout
    // with the SAME stored bytes — stored row 0 becomes image row 0
    val bb = java.nio.ByteBuffer.wrap(bmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val d = MultimodalOps.decodeBmp(10L, bmp)
    assert(d.height == 2)
    // the encoder stored image row 1 first, so reading top-down makes
    // payload byte 9 the top-left pixel's blue channel
    assert(d.top_left_blue == 10)
  }

  test("BMP zero-height decodes empty; malformed BMPs FAIL") {
    val empty = MultimodalOps.decodeBmp(11L,
      MultimodalOps.encodeBmp(Array[Byte](1, 2, 3))) // < 1 row
    assert(empty.height == 0 && empty.mean_pixel == 0.0
      && empty.top_left_blue == 0)
    val good = MultimodalOps.encodeBmp(Array.tabulate(9)(_.toByte))
    // truncated raster
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeBmp(12L, good.dropRight(5))
    }
    // wrong magic
    intercept[IllegalArgumentException] {
      val bad = good.clone(); bad(0) = 'X'.toByte
      MultimodalOps.decodeBmp(13L, bad)
    }
    // 8-bit palette BMP unsupported (bpp at offset 28, u16 LE)
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      java.nio.ByteBuffer.wrap(bad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
      MultimodalOps.decodeBmp(14L, bad)
    }
    // RLE compression unsupported (compression at offset 30, u32 LE)
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      java.nio.ByteBuffer.wrap(bad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(30, 1)
      MultimodalOps.decodeBmp(15L, bad)
    }
  }

  test("fixture encode → real decode identity over document text") {
    val rows = MultimodalOps.decodeImages(
        Tables.load(spark, sfDir, "documents"))
      .collect()
    assert(rows.nonEmpty)
    val texts = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      val h = bytes.length / 12
      assert(r.getInt(2) == 4, "width is the fixture's 4px")
      assert(r.getInt(3) == h, s"height = len/12 for doc ${r.getLong(0)}")
      assert(r.getInt(1) == 10 + h.toString.length + 12 * h)
      val want =
        if (h == 0) 0.0
        else bytes.take(12 * h).map(_ & 0xff).sum.toDouble / (12 * h)
      assert(math.abs(r.getDouble(5) - want) < 1e-9)
    }
  }

  test("q161 WAV decoder: round-trips the fixture encoder exactly") {
    val payload = Array[Byte](0x7f, -1, -128, 0, 0, 1, 10) // odd tail drops
    val a = operators.MultimodalOps.decodeWav(
      7L, operators.MultimodalOps.encodeWav(payload))
    // samples big-endian-from-payload: 0x7fff=32767, 0x8000=-32768,
    // 0x0001=1 — peak is 32768 (the negative rail)
    assert(a.n_samples == 3 && a.sample_rate == 8000)
    assert(a.n_bytes == 44 + 6)
    assert(a.duration_us == 3L * 1000000 / 8000)
    assert(a.peak == 32768)
    val sumSq = 32767L * 32767 + 32768L * 32768 + 1L
    assert(math.abs(a.rms - math.sqrt(sumSq.toDouble / 3)) < 1e-12)
  }

  test("q161 WAV decoder: skips unknown chunks, honors odd-size padding") {
    // hand-build: RIFF [ junk(3 bytes, padded) | fmt | data ]
    val data = Array[Byte](1, 0, 2, 0) // samples 1, 2 (LE)
    val bb = java.nio.ByteBuffer.allocate(200)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](9, 9, 9)).put(0.toByte) // odd size -> pad byte
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(4).put(data)
    val wav = java.util.Arrays.copyOf(bb.array(), bb.position())
    val a = operators.MultimodalOps.decodeWav(1L, wav)
    assert(a.n_samples == 2 && a.peak == 2)
    // truncated/alien payloads must throw, never fabricate
    intercept[IllegalArgumentException] {
      operators.MultimodalOps.decodeWav(2L, "RIFFxxxx".getBytes)
    }
    intercept[IllegalArgumentException] {
      operators.MultimodalOps.decodeWav(3L,
        java.util.Arrays.copyOf(wav, 30)) // data chunk cut off
    }
  }

  test("q186 stereo-PCM8 decoder: round-trips the fixture, centers unsigned samples") {
    // frames (L, R): (0, 255), (128, 1) — PCM8 is unsigned, so the
    // decoder must re-center: L = -128, 0 ; R = 127, -127
    val payload = Array[Byte](0, -1, -128, 1, 9) // odd tail drops
    val a = operators.MultimodalOps.decodeWavStereo8(
      7L, operators.MultimodalOps.encodeWavStereo8(payload))
    assert(a.n_frames == 2 && a.sample_rate == 11025)
    assert(a.n_bytes == 44 + 4)
    assert(a.duration_us == 2L * 1000000 / 11025)
    // channel separation: a swap would trade these peaks
    assert(a.peak_l == 128 && a.peak_r == 127)
    assert(math.abs(a.rms_l - math.sqrt((128L * 128) / 2.0)) < 1e-12)
    assert(math.abs(a.rms_r
      - math.sqrt((127L * 127 + 127L * 127) / 2.0)) < 1e-12)
  }

  test("q161/q186 decoders reject each other's format — no silent downmix") {
    val mono16 = operators.MultimodalOps.encodeWav(Array[Byte](1, 2, 3, 4))
    val stereo8 =
      operators.MultimodalOps.encodeWavStereo8(Array[Byte](1, 2, 3, 4))
    intercept[IllegalArgumentException] {
      operators.MultimodalOps.decodeWav(1L, stereo8)
    }
    intercept[IllegalArgumentException] {
      operators.MultimodalOps.decodeWavStereo8(2L, mono16)
    }
    // the shared walker still rejects depths/layouts outside the spec'd
    // matrix (e.g. a 4-channel fmt) rather than guessing
    val bb = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(4).putInt(8000).putInt(64000)
      .putShort(8).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(0)
    val quad = java.util.Arrays.copyOf(bb.array(), bb.position())
    intercept[IllegalArgumentException] {
      operators.MultimodalOps.decodeWavStereo8(3L, quad)
    }
  }

  test("q192 GIF-LZW: exhaustive round-trip sweep across code-width boundaries") {
    import operators.MultimodalOps.{decodeGif, encodeGif}
    def expect(payload: Array[Byte]): (Long, Long, Int) = {
      val n = (payload.length / 4) * 4
      var s = 0L; var ps = 0L
      var i = 0
      while (i < n) {
        val v = payload(i) & 0xff; s += v; ps += (i + 1).toLong * v
        i += 1
      }
      (s, ps, n)
    }
    def check(payload: Array[Byte], tag: String): Unit = {
      val d = decodeGif(1L, encodeGif(payload))
      val (s, ps, n) = expect(payload)
      assert(d.n_pixels == n, tag)
      assert(d.pos_sum == ps, s"$tag: position-weighted checksum")
      if (n > 0) {
        assert(d.mean_index == s.toDouble / n, tag)
        assert(d.top_left_index == (payload(0) & 0xff), tag)
      }
    }
    // deterministic LCG bytes; sweep EVERY pixel count 0..1200 so the
    // 9->10-bit switch (dict add #254/#255) is crossed at every
    // alignment, plus spot sizes crossing 10->11, 11->12 and the 4096
    // dictionary reset (adds track length closely on non-repeating data)
    var seed = 12345L
    def lcgBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        a(i) = (seed >>> 33).toByte; i += 1
      }
      a
    }
    (0 to 1200).foreach(n => check(lcgBytes(n), s"lcg-$n"))
    Seq(3000, 5000, 9000, 20000, 50000).foreach(n =>
      check(lcgBytes(n), s"lcg-big-$n"))
    // all-same bytes: the KwKwK (code == free) path on every add
    (0 to 400).foreach(n => check(Array.fill(n)('a'.toByte), s"kwk-$n"))
    // period-2/3 repeats: KwKwK at varying phases
    (1 to 300).foreach { n =>
      check(Array.tabulate(n)(i => (if (i % 2 == 0) 'x' else 'y').toByte),
        s"ab-$n")
      check(Array.tabulate(n)(i => ('a' + i % 3).toByte), s"abc-$n")
    }
  }

  test("q192 GIF decoder rejects malformed containers") {
    import operators.MultimodalOps.{decodeGif, encodeGif}
    val ok = encodeGif("hello gif world!".getBytes("US-ASCII"))
    assert(decodeGif(1L, ok).n_pixels == 16)
    intercept[IllegalArgumentException] { // bad signature
      decodeGif(2L, "GIF89a".getBytes ++ ok.drop(6))
    }
    intercept[IllegalArgumentException] { // truncated mid-sub-block
      decodeGif(3L, java.util.Arrays.copyOf(ok, ok.length - 6))
    }
    intercept[IllegalArgumentException] { // missing trailer
      decodeGif(4L, java.util.Arrays.copyOf(ok, ok.length - 1))
    }
    // corrupt LZW: flip a data byte -> decoded raster can't tile WxH
    // (or the walk hits an out-of-range code) — never silent
    val corrupt = ok.clone()
    val dataStart = 6 + 7 + 768 + 10 + 1 + 1
    corrupt(dataStart) = (corrupt(dataStart) ^ 0x55).toByte
    intercept[IllegalArgumentException] { decodeGif(5L, corrupt) }
  }

  test("q199 μ-law: G.711 curve anchors, symmetry, monotone segments") {
    import operators.MultimodalOps.ulaw2linear
    // published extremes of the Sun/CCITT ulaw2linear table
    assert(ulaw2linear(0x00) == -32124)
    assert(ulaw2linear(0x80) == 32124)
    assert(ulaw2linear(0x7f) == 0)
    assert(ulaw2linear(0xff) == 0)
    // sign bit negates the magnitude, for every code
    (0 to 255).foreach(c =>
      assert(ulaw2linear(c ^ 0x80) == -ulaw2linear(c), s"code $c"))
    // the positive half decodes strictly decreasing 32124 -> 0
    val pos = (0x80 to 0xff).map(ulaw2linear)
    assert(pos.zip(pos.tail).forall { case (a, b) => a > b })
  }

  test("q199 μ-law decoder: round-trips the fixture; strict format tag") {
    import operators.MultimodalOps.{decodeWav, decodeWavMulaw,
      decodeWavStereo8, encodeWav, encodeWavMulaw, encodeWavStereo8,
      ulaw2linear}
    val payload = (0 to 255).map(_.toByte).toArray
    val d = decodeWavMulaw(7L, encodeWavMulaw(payload))
    val vals = payload.map(b => ulaw2linear(b & 0xff))
    assert(d.n_samples == 256 && d.sample_rate == 8000)
    assert(d.n_bytes == 44 + 256 && d.duration_us == 256000000L / 8000)
    assert(d.peak == vals.map(math.abs).max)
    val sumSq = vals.map(v => v.toLong * v).sum
    assert(d.rms == math.sqrt(sumSq.toDouble / 256))
    assert(decodeWavMulaw(8L, encodeWavMulaw(Array.empty)).rms == 0.0)
    // format tags are mutually exclusive: no silent reinterpretation
    intercept[IllegalArgumentException] {
      decodeWavMulaw(9L, encodeWav(payload))
    }
    intercept[IllegalArgumentException] {
      decodeWavMulaw(10L, encodeWavStereo8(payload))
    }
    intercept[IllegalArgumentException] {
      decodeWav(11L, encodeWavMulaw(payload))
    }
    intercept[IllegalArgumentException] {
      decodeWavStereo8(12L, encodeWavMulaw(payload))
    }
  }

  test("q248 GIF local color table: LZW round-trip; palette content " +
      "verified in both placements") {
    import operators.MultimodalOps.{decodeGif, encodeGif, encodeGifLct}
    def check(payload: Array[Byte], tag: String): Unit = {
      val d = decodeGif(1L, encodeGifLct(payload))
      val n = (payload.length / 4) * 4
      var s = 0L; var ps = 0L; var i = 0
      while (i < n) {
        val v = payload(i) & 0xff; s += v; ps += (i + 1).toLong * v
        i += 1
      }
      assert(d.width == 4 && d.n_pixels == n, tag)
      assert(d.pos_sum == ps, s"$tag: checksum")
      if (n > 0) {
        assert(d.mean_index == s.toDouble / n, tag)
        assert(d.top_left_index == (payload(0) & 0xff), tag)
      }
    }
    var seed = 111222333L
    def lcgBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        a(i) = (seed >>> 33).toByte; i += 1
      }
      a
    }
    (0 to 400).foreach(n => check(lcgBytes(n), s"lcg-$n"))
    Seq(5000, 20000).foreach(n => check(lcgBytes(n), s"big-$n"))
    // palette CONTENT is verified, not skipped: corrupt one LOCAL
    // table entry (LCT starts at 6+7+10 = 23) -> loud failure
    val okL = encodeGifLct(lcgBytes(64))
    val badL = okL.clone()
    badL(23 + 150) = (badL(23 + 150) ^ 0x55).toByte
    intercept[IllegalArgumentException] { decodeGif(2L, badL) }
    // ...and the same guard now covers the GLOBAL table (GCT at 13)
    val okG = encodeGif(lcgBytes(64))
    val badG = okG.clone()
    badG(13 + 150) = (badG(13 + 150) ^ 0x55).toByte
    intercept[IllegalArgumentException] { decodeGif(3L, badG) }
  }

  test("q196 PNG: round-trip sweep crosses zlib + all five filters") {
    import operators.MultimodalOps.{decodePng, encodePng}
    def check(payload: Array[Byte], tag: String): Unit = {
      val d = decodePng(1L, encodePng(payload))
      val n = (payload.length / 4) * 4
      var s = 0L; var ps = 0L
      var i = 0
      while (i < n) {
        val v = payload(i) & 0xff; s += v; ps += (i + 1).toLong * v
        i += 1
      }
      assert(d.width == 4 && d.n_pixels == n, tag)
      assert(d.pos_sum == ps, s"$tag: position-weighted checksum")
      if (n > 0) {
        assert(d.mean_gray == s.toDouble / n, tag)
        assert(d.top_left_gray == (payload(0) & 0xff), tag)
      }
    }
    // every size 0..600: rows cycle filter r % 5, so any height >= 5
    // exercises None/Sub/Up/Average/Paeth against real neighbor bytes
    var seed = 987654321L
    def lcgBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        a(i) = (seed >>> 33).toByte; i += 1
      }
      a
    }
    (0 to 600).foreach(n => check(lcgBytes(n), s"lcg-$n"))
    Seq(5000, 20000, 100000).foreach(n => check(lcgBytes(n), s"big-$n"))
    // constant + ramp rasters: Sub/Up residuals go all-zero (max
    // DEFLATE compression), Average/Paeth predictions exact
    (0 to 200).foreach(n => check(Array.fill(n)('m'.toByte), s"flat-$n"))
    check(Array.tabulate(1024)(i => (i % 251).toByte), "ramp")
  }

  test("q241 truecolor PNG: bpp-offset filters, exact per-channel means") {
    import operators.MultimodalOps.{decodePng, decodePngRgb, encodePng,
      encodePngRgb}
    def check(payload: Array[Byte], tag: String): Unit = {
      val d = decodePngRgb(1L, encodePngRgb(payload))
      val n = (payload.length / 12) * 12
      val np = n / 3
      val s = new Array[Long](3); var ps = 0L
      var i = 0
      while (i < n) {
        val v = payload(i) & 0xff; s(i % 3) += v
        ps += (i + 1).toLong * v
        i += 1
      }
      assert(d.width == 4 && d.height == n / 12 && d.n_pixels == np, tag)
      assert(d.pos_sum == ps, s"$tag: position-weighted checksum")
      if (np > 0) {
        assert(d.mean_r == s(0).toDouble / np, tag)
        assert(d.mean_g == s(1).toDouble / np, tag)
        assert(d.mean_b == s(2).toDouble / np, tag)
        assert(d.top_left_r == (payload(0) & 0xff), tag)
      }
    }
    // sizes 0..600 cover heights 0..50 (every filter, partial rows);
    // the filters now predict at the 3-byte bpp offset, so a decoder
    // using offset 1 breaks Sub/Average/Paeth rows immediately
    var seed = 192837465L
    def lcgBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        a(i) = (seed >>> 33).toByte; i += 1
      }
      a
    }
    (0 to 600).foreach(n => check(lcgBytes(n), s"lcg-$n"))
    Seq(6000, 24000, 60000).foreach(n => check(lcgBytes(n), s"big-$n"))
    (0 to 200).foreach(n => check(Array.fill(n)('m'.toByte), s"flat-$n"))
    check(Array.tabulate(1200)(i => (i % 251).toByte), "ramp")
    // a channel-striped raster separates the means exactly — a
    // flat-byte (offset-1) decoder would mix them
    val striped = Array.tabulate(120)(i => (i % 3 match {
      case 0 => 10; case 1 => 20; case _ => 30
    }).toByte)
    val ds = decodePngRgb(2L, encodePngRgb(striped))
    assert(ds.mean_r == 10.0 && ds.mean_g == 20.0 && ds.mean_b == 30.0)
    // cross-type: the gray decoder refuses truecolor and vice versa
    val pay = lcgBytes(120)
    intercept[IllegalArgumentException] { decodePng(9L, encodePngRgb(pay)) }
    intercept[IllegalArgumentException] { decodePngRgb(9L, encodePng(pay)) }
  }

  test("q243 RGBA PNG: bpp-4 filters, alpha audited as its own plane") {
    import operators.MultimodalOps.{decodePngRgb, decodePngRgba,
      encodePngRgb, encodePngRgba}
    def check(payload: Array[Byte], tag: String): Unit = {
      val d = decodePngRgba(1L, encodePngRgba(payload))
      val n = (payload.length / 16) * 16
      val np = n / 4
      val s = new Array[Long](4); var ps = 0L
      var i = 0
      while (i < n) {
        val v = payload(i) & 0xff; s(i % 4) += v
        ps += (i + 1).toLong * v
        i += 1
      }
      assert(d.width == 4 && d.height == n / 16 && d.n_pixels == np, tag)
      assert(d.pos_sum == ps, s"$tag: position-weighted checksum")
      if (np > 0) {
        assert(d.mean_r == s(0).toDouble / np, tag)
        assert(d.mean_g == s(1).toDouble / np, tag)
        assert(d.mean_b == s(2).toDouble / np, tag)
        assert(d.mean_a == s(3).toDouble / np, tag)
        assert(d.top_left_r == (payload(0) & 0xff), tag)
      }
    }
    var seed = 564738291L
    def lcgBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        a(i) = (seed >>> 33).toByte; i += 1
      }
      a
    }
    (0 to 600).foreach(n => check(lcgBytes(n), s"lcg-$n"))
    Seq(8000, 32000).foreach(n => check(lcgBytes(n), s"big-$n"))
    (0 to 160).foreach(n => check(Array.fill(n)('q'.toByte), s"flat-$n"))
    // channel stripes separate all four means exactly — an offset-3
    // (RGB) or offset-1 (flat) filter reader mixes them
    val striped = Array.tabulate(160)(i => (40 + 10 * (i % 4)).toByte)
    val ds = decodePngRgba(2L, encodePngRgba(striped))
    assert(ds.mean_r == 40.0 && ds.mean_g == 50.0 &&
      ds.mean_b == 60.0 && ds.mean_a == 70.0)
    // RGB and RGBA decoders refuse each other's color type
    val pay = lcgBytes(240)
    intercept[IllegalArgumentException] {
      decodePngRgb(9L, encodePngRgba(pay))
    }
    intercept[IllegalArgumentException] {
      decodePngRgba(9L, encodePngRgb(pay))
    }
  }

  test("q196 PNG decoder rejects malformed containers") {
    import operators.MultimodalOps.{decodePng, encodeBmp, encodeGif,
      encodePng}
    val payload = "the quick brown png fox jumps".getBytes("US-ASCII")
    val ok = encodePng(payload)
    assert(decodePng(1L, ok).n_pixels == 28)
    intercept[IllegalArgumentException] { // bad signature
      decodePng(2L, "PNG!".getBytes ++ ok.drop(4))
    }
    intercept[IllegalArgumentException] { // truncated mid-chunk
      decodePng(3L, java.util.Arrays.copyOf(ok, ok.length - 6))
    }
    intercept[IllegalArgumentException] { // trailing bytes after IEND
      decodePng(4L, ok :+ 0.toByte)
    }
    // corrupt ANY single IDAT payload byte -> the chunk CRC catches it
    val corrupt = ok.clone()
    val idatData = 8 + 25 + 8 // sig + IHDR chunk + IDAT len/type
    corrupt(idatData) = (corrupt(idatData) ^ 0x55).toByte
    intercept[IllegalArgumentException] { decodePng(5L, corrupt) }
    // corrupt the CRC itself -> same loud failure
    val badCrc = ok.clone() // last 4 bytes = IEND's CRC
    badCrc(badCrc.length - 2) = (badCrc(badCrc.length - 2) ^ 1).toByte
    intercept[IllegalArgumentException] { decodePng(6L, badCrc) }
    // cross-format: the PNG decoder refuses the other containers
    intercept[IllegalArgumentException] { decodePng(7L, encodeGif(payload)) }
    intercept[IllegalArgumentException] { decodePng(8L, encodeBmp(payload)) }
  }

  test("q260 ustar: round-trip with padding edges; strict parser") {
    import operators.MultimodalOps.{decodeTarShard, encodeTarShard}
    val members = Seq(
      7L -> "hello tar".getBytes("US-ASCII"),
      8L -> Array.empty[Byte], // zero-size member: no content blocks
      9L -> Array.tabulate(512)(_.toByte), // exactly one block: no pad
      10L -> Array.tabulate(513)(_.toByte)) // one byte into block two
    val tar = encodeTarShard(members)
    assert(tar.length % 512 == 0)
    // exact layout arithmetic: 4 headers + 0 + 1 + 1 + 2 content
    // blocks + 2 terminator blocks
    assert(tar.length == 512 * (4 + 0 + 1 + 1 + 2 + 2))
    val got = decodeTarShard(1L, tar)
    assert(got.map(t => (t._1, t._2)) ==
      Seq((7L, 9), (8L, 0), (9L, 512), (10L, 513)))
    assert(got.map(_._3) == members.sortBy(_._1)
      .map(_._2.map(_ & 0xff).map(_.toLong).sum))
    // corruption: one flipped content... header byte breaks the checksum
    val bad = tar.clone(); bad(1) = 'X'.toByte
    intercept[IllegalArgumentException] { decodeTarShard(2L, bad) }
    // magic wiped
    val nomagic = tar.clone()
    nomagic(257) = 'X'.toByte
    intercept[IllegalArgumentException] { decodeTarShard(3L, nomagic) }
    // truncated mid-member
    intercept[IllegalArgumentException] {
      decodeTarShard(4L, java.util.Arrays.copyOf(tar, tar.length - 1536))
    }
    // a single zero block is not a terminator
    intercept[IllegalArgumentException] {
      decodeTarShard(5L, java.util.Arrays.copyOf(tar, tar.length - 512))
    }
    // trailing garbage after the terminator
    intercept[IllegalArgumentException] {
      decodeTarShard(6L, tar ++ Array.fill(512)(1.toByte))
    }
    // foreign member names are refused, not silently skipped
    val foreign = encodeTarShard(Seq(1L -> "x".getBytes))
    val renamed = foreign.clone()
    renamed(0) = 'z'.toByte // doc1.txt -> zoc1.txt, fix checksum
    var sum = 0
    for (i <- 0 until 512)
      sum += (if (i >= 148 && i < 156) ' '.toInt else renamed(i) & 0xff)
    val oct = f"$sum%06o".getBytes("US-ASCII")
    System.arraycopy(oct, 0, renamed, 148, 6)
    renamed(154) = 0; renamed(155) = ' '.toByte
    val e = intercept[IllegalArgumentException] {
      decodeTarShard(7L, renamed)
    }
    assert(e.getMessage.contains("unexpected member name"))
  }

  test("q255 Adam7 PNG: interlaced round-trip across pass-edge heights") {
    import operators.MultimodalOps.{decodePng, encodePng, encodePngAdam7}
    // heights chosen to hit the pass-geometry corners at width 4:
    // h=1 (only passes with y0=0 and dy covering row 0 non-empty),
    // h=2 (pass 7 gets its first row), h=5 (pass 3 opens), h=8 (full
    // 8x8 tile), h=13 (ragged ceil division in every pass)
    for (h <- Seq(1, 2, 3, 5, 8, 13)) {
      val payload = Array.tabulate(4 * h)(i => ((i * 37 + h) % 251).toByte)
      val seq = decodePng(h.toLong, encodePng(payload))
      val adam = decodePng(h.toLong, encodePngAdam7(payload))
      // the interlaced stream must reconstruct the IDENTICAL raster:
      // every feature equal to the sequential path's
      assert(adam == seq, s"h=$h")
      assert(adam.height == h && adam.pos_sum ==
        payload.zipWithIndex.map { case (b, i) =>
          (i + 1).toLong * (b & 0xff) }.sum, s"h=$h")
    }
  }

  test("q255 Adam7 PNG: malformed interlace fails loudly") {
    import operators.MultimodalOps.{decodePng, encodePng, encodePngAdam7}
    val payload = "adam seven interlace pass".getBytes("US-ASCII")
    val ok = encodePngAdam7(payload)
    assert(decodePng(1L, ok).n_pixels == 24)
    // interlace method 2 does not exist: patch the IHDR byte and fix
    // its chunk CRC so ONLY the method check can reject it
    val bad = ok.clone()
    bad(8 + 8 + 12) = 2.toByte // sig + len/type + 13th IHDR data byte
    val crc = new java.util.zip.CRC32()
    crc.update(bad, 8 + 4, 4 + 13)
    val cv = crc.getValue.toInt
    bad(8 + 8 + 13) = (cv >>> 24).toByte
    bad(8 + 8 + 14) = (cv >>> 16).toByte
    bad(8 + 8 + 15) = (cv >>> 8).toByte
    bad(8 + 8 + 16) = cv.toByte
    val e = intercept[IllegalArgumentException] { decodePng(2L, bad) }
    assert(e.getMessage.contains("interlace"))
    // a truncated interlaced zlib stream still fails the geometry
    intercept[IllegalArgumentException] {
      decodePng(3L, java.util.Arrays.copyOf(ok, ok.length - 16))
    }
  }

  test("q251 JPEG: closed-form block, exact pixel pattern, full-byte sweep") {
    import operators.MultimodalOps.{decodeJpeg, decodeJpegRaster, encodeJpeg}
    // "ab": one block, v = 8 + 97 = 105, d = 98 % 8 = 2
    val one = decodeJpeg(1L, encodeJpeg("ab".getBytes("US-ASCII")))
    assert(one.width == 8 && one.height == 8 && one.n_blocks == 1
      && one.n_pixels == 64)
    assert(one.mean_r == 105.0 && one.mean_g == 105.0 && one.mean_b == 105.0)
    assert(one.mean_amp == 2.0 && one.top_left_r == 107
      && one.dc_checksum == 105L)
    // pixel-exact: the (4,4) basis puts v + d*s(x)*s(y) with
    // s = (+,-,-,+,+,-,-,+) — the whole decoded raster, all channels
    val (w, h, rgb) = decodeJpegRaster(2L, encodeJpeg("ab".getBytes))
    assert(w == 8 && h == 8)
    val s = Array(1, -1, -1, 1, 1, -1, -1, 1)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      assert((rgb((y * 8 + x) * 3 + c) & 0xff) == 105 + 2 * s(x) * s(y),
        s"pixel ($x,$y) channel $c")
    // all 256 byte values in both roles: v spans [8,247] (the % 240
    // fold), d spans [0,7] incl. the EOB-only d=0 path, DC diffs swing
    // negative through category 8 — features must equal closed form
    val all = Array.tabulate(256)(_.toByte)
    val dec = decodeJpeg(3L, encodeJpeg(all))
    val vs = Array.tabulate(128)(i => 8 + ((all(2 * i) & 0xff) % 240))
    val ds = Array.tabulate(128)(i => (all(2 * i + 1) & 0xff) % 8)
    assert(dec.n_blocks == 128 && dec.height == 1024)
    assert(dec.mean_r == vs.sum.toDouble / 128)
    assert(dec.mean_g == dec.mean_r && dec.mean_b == dec.mean_r)
    assert(dec.mean_amp == ds.sum.toDouble / 128)
    assert(dec.top_left_r == vs(0) + ds(0))
    assert(dec.dc_checksum ==
      vs.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum)
  }

  test("q251 JPEG decoder rejects malformed and non-baseline streams") {
    import operators.MultimodalOps.{decodeJpeg, encodeJpeg, encodePng}
    val payload = "the quick brown jpeg fox".getBytes("US-ASCII")
    val ok = encodeJpeg(payload)
    assert(decodeJpeg(1L, ok).n_blocks == 12)
    intercept[IllegalArgumentException] { // missing SOI
      decodeJpeg(2L, ok.drop(2))
    }
    intercept[IllegalArgumentException] { // truncated entropy stream
      decodeJpeg(3L, java.util.Arrays.copyOf(ok, ok.length - 12))
    }
    intercept[IllegalArgumentException] { // trailing bytes after EOI
      decodeJpeg(4L, ok :+ 0.toByte)
    }
    // progressive SOF (ffc2) must be refused, not half-decoded
    val prog = ok.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff
      && i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException] { decodeJpeg(5L, prog) }
    assert(e.getMessage.contains("non-baseline"))
    // a true marker spliced into the entropy data fails loudly
    val spliced = ok.dropRight(2) ++
      Array(0xff.toByte, 0xd7.toByte) ++ ok.takeRight(2)
    intercept[IllegalArgumentException] { decodeJpeg(6L, spliced) }
    // cross-format: refuses the other containers
    intercept[IllegalArgumentException] { decodeJpeg(7L, encodePng(payload)) }
  }

  test("q256 A-law: G.711 curve anchors, symmetry, segment structure") {
    import operators.MultimodalOps.{alaw2linear, ulaw2linear}
    // published anchors: code 0x55 (a = 0) is the smallest negative
    // (-8); its sign twin 0xD5 is +8; 0x2A (a = 0x7F) is the deepest
    // negative segment's max magnitude -32256; 0xAA its positive twin
    assert(alaw2linear(0x55) == -8)
    assert(alaw2linear(0xd5) == 8)
    assert(alaw2linear(0x2a) == -32256)
    assert(alaw2linear(0xaa) == 32256)
    // sign symmetry: toggling bit 7 of the CODE negates the value
    for (c <- 0 until 128)
      assert(alaw2linear(c) == -alaw2linear(c | 0x80), s"code $c")
    // segments are monotone within sign: positive codes sorted by
    // (seg, mantissa) give strictly increasing magnitudes
    val pos = (0 until 128).map(c => alaw2linear(c | 0x80))
    assert(pos.forall(_ > 0) && pos.min == 8 && pos.max == 32256)
    // the two G.711 curves must differ (a decoder swapping them is
    // wrong on ~every code, not subtly off)
    val same = (0 until 256).count(c => alaw2linear(c) == ulaw2linear(c))
    assert(same < 16, s"A-law and mu-law agree on $same codes")
  }

  test("q256 A-law decoder: round-trips the fixture; strict format tag") {
    import operators.MultimodalOps.{decodeWavAlaw, decodeWavMulaw,
      encodeWavAlaw, encodeWavMulaw, alaw2linear}
    val codes = Array.tabulate(256)(_.toByte)
    val d = decodeWavAlaw(5L, encodeWavAlaw(codes))
    assert(d.n_samples == 256 && d.sample_rate == 8000)
    assert(d.duration_us == 256L * 1000000L / 8000L)
    val vals = (0 until 256).map(alaw2linear)
    assert(d.peak == vals.map(math.abs).max)
    val wantRms = math.sqrt(vals.map(v => v.toLong * v).sum.toDouble / 256)
    assert(math.abs(d.rms - wantRms) < 1e-9)
    // strict tags: each G.711 decoder refuses the other's container
    intercept[IllegalArgumentException] {
      decodeWavAlaw(6L, encodeWavMulaw(codes))
    }
    intercept[IllegalArgumentException] {
      decodeWavMulaw(7L, encodeWavAlaw(codes))
    }
  }

  test("q259 pigeonhole Hamming ball == brute force on crafted codes") {
    import spark.implicits._
    import operators.MultimodalOps.phashHammingPairsFromCodes
    // codes crafted around the guarantee edge: distance exactly 3
    // (found), distance 4 spread over all 4 blocks (must NOT appear),
    // distance 4 inside one block (also out: verify says 4 > 3)
    val codes = Seq(
      0L -> 0x000000L,
      1L -> 0x000007L, // 3 bits in block 0 -> dist 3 from doc 0
      2L -> 0x041041L, // 1 bit in each of blocks 0,1,2,3... (bits 0,6,12,18)
      3L -> 0x00000FL // 4 bits in block 0 -> dist 4 from doc 0
    ).map { case (id, c) => (id, c) }.toDF("doc_id", "phash")
    val got = phashHammingPairsFromCodes(codes, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Int]("hamming")).toMap
    assert(got((0L, 1L)) == 3) // exactly at the bound
    assert(!got.contains((0L, 2L))) // dist 4, one bit per block
    assert(!got.contains((0L, 3L))) // dist 4 within one block
    assert(got((1L, 3L)) == 1) // 0x07 vs 0x0F differ in one bit
    // brute-force twin over all pairs agrees exactly
    val rows = codes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ca) <- rows; (b, cb) <- rows if a < b
      h = java.lang.Long.bitCount(ca ^ cb) if h <= 3
    } yield (a, b) -> h).toMap
    assert(got == brute)
  }

  test("q168 phash: brightness-invariant gradients; planted pairs collide") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t1 = "abcjelmgqidolkjfabcdwxyz" // len 24 -> h = 2
    val t2 = t1.map(c => (c + 1).toChar) // uniform brightness shift
    val hashes = Seq(t1, t2).toDF("text")
      .withColumn("h", expr("CAST(FLOOR(length(text) / 12.0) AS INT)"))
      .select(expr(operators.MultimodalOps.phashSql("text", "h")))
      .collect().map(_.getLong(0))
    // dHash compares neighboring luminances: a constant shift keeps
    // every gradient sign, so the perceptual hash must not move
    assert(hashes(0) == hashes(1))
    val groups = operators.MultimodalOps
      .queries("q168_phash_dedup")(spark, sfDir).collect()
    assert(groups.length >= 200, s"planted pairs missing: ${groups.length}")
    groups.foreach { g =>
      assert(g.getAs[Long]("n") >= 2)
      assert(g.getAs[Long]("min_doc") < g.getAs[Long]("max_doc"))
    }
  }

  test("q267 4:2:0 JPEG: quadrant order, chroma path, exact features") {
    // two MCUs, distinct quadrant lumas, distinct planted chroma
    val payload = Array[Int](10, 60, 110, 160, 5, 200, 20, 70, 120, 40)
      .map(_.toByte)
    val jpg = MultimodalOps.encodeJpeg420(payload)
    val d = MultimodalOps.decodeJpeg420(40L, jpg)
    assert(d.width == 16 && d.height == 32 && d.n_mcus == 2)
    // quadrant means: MCU0 lumas 46/96/146/196, MCU1 52/56/106/156
    assert(d.mean_y_tl == 49.0 && d.mean_y_tr == 76.0)
    assert(d.mean_y_bl == 126.0 && d.mean_y_br == 176.0)
    // cb offsets −15 and +20: B−R = round(1.772·off) → (−27+35)/2,
    // G−R = round(−0.344136·off) → (5−7)/2
    assert(d.db_mean == 4.0, s"db=${d.db_mean}")
    assert(d.dg_mean == -1.0, s"dg=${d.dg_mean}")
    assert(d.top_left_r == 46)
    // 4:2:2 (Y sampling 2×1) is NOT supported: patch the SOF0
    // sampling byte and the decode must fail, not mis-frame
    val bad = jpg.clone()
    assert((bad(82) & 0xff) == 0x22, "SOF0 layout shifted")
    bad(82) = 0x21.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeJpeg420(41L, bad)
    }
  }

  test("q267 rounding domain: no ±0.5 boundary in either chroma term") {
    // the oracle rounds with DuckDB (half away from zero), the JVM
    // with floor(x+0.5); they differ only AT a .5 boundary — prove
    // the fixture's whole cb domain stays > 1e-6 away from one
    (-20 to 20).foreach { k =>
      Seq(1.772 * k, -0.344136 * k).foreach { v =>
        val fr = math.abs(v - math.floor(v) - 0.5)
        assert(fr > 1e-6, s"k=$k v=$v sits on a rounding boundary")
      }
    }
  }

  test("q263 WARC: round-trip framing, byte-exact sizes, malformed FAIL") {
    val members = Seq(
      (7L, "hello world".getBytes("US-ASCII")),
      (12L, Array.empty[Byte]),
      (305L, Array.tabulate(300)(i => ((i % 90) + 33).toByte)))
    val warc = MultimodalOps.encodeWarcShard(2L, members)
    val (n, recs) = MultimodalOps.decodeWarcShard(2L, warc)
    assert(n == 4) // warcinfo + 3 responses
    assert(recs.map(_.docId) == Seq(7L, 12L, 305L))
    val r7 = recs.head
    assert(r7.targetUri == "https://example.com/doc/7")
    assert(r7.status == 200 && r7.bodyBytes == 11)
    assert(r7.recordBytes == 50) // 37 + digits(11) + 11
    val want = "hello world".getBytes("US-ASCII").zipWithIndex
      .map { case (b, i) => (i + 1).toLong * (b & 0xff) }.sum
    assert(r7.bodyChecksum == want)
    // zero-body response: cl = 37 + 1 + 0, checksum 0
    assert(recs(1).recordBytes == 38 && recs(1).bodyChecksum == 0L)
    // file size closed form: (149 + digits(shard)) warcinfo +
    // per response 182 + 2·digits(id) + digits(cl) + cl
    def rec(id: Long, nb: Int) = {
      val cl = 37 + nb.toString.length + nb
      182 + 2 * id.toString.length + cl.toString.length + cl
    }
    assert(warc.length == 150 + rec(7, 11) + rec(12, 0) + rec(305, 300))
    // corrupted record trailer: FAIL, never shear
    val bad = warc.clone()
    bad(bad.length - 1) = 'X'.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeWarcShard(2L, bad)
    }
    // bare LF where the version line's CR belongs
    val lf = warc.clone()
    lf(8) = '\n'.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeWarcShard(2L, lf)
    }
    // HTTP Content-Length disagreeing with the body extent (same
    // byte length, so WARC framing stays intact — only the HTTP
    // cross-check can catch it)
    val s = new String(warc, "US-ASCII")
    val at = s.indexOf("Content-Length: 11\r\n\r\nhello")
    assert(at > 0)
    val mm = warc.clone()
    mm(at + 16) = '2'.toByte // 11 -> 21
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeWarcShard(2L, mm)
    }
  }

  test("q268 gzip members: boundaries, CRC verify, corrupted FAIL") {
    val a = "first record payload".getBytes("US-ASCII")
    val b = Array.tabulate(500)(i => ((i * 7) % 251).toByte)
    val file = MultimodalOps.gzipMember(a) ++ MultimodalOps.gzipMember(b)
    val back = MultimodalOps.gunzipMembers(1L, file)
    assert(back.size == 2)
    assert(java.util.Arrays.equals(back(0), a))
    assert(java.util.Arrays.equals(back(1), b))
    // deflate genuinely compressed the repetitive second member
    assert(file.length < a.length + b.length + 36,
      "wire bytes are not compressed")
    // flip one compressed byte mid-member-2: CRC (or the deflate
    // stream itself) must fail loudly
    val m1len = MultimodalOps.gzipMember(a).length
    val bad = file.clone()
    bad(m1len + 15) = (bad(m1len + 15) ^ 0x40).toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.gunzipMembers(2L, bad)
    }
    // corrupt an ISIZE trailer byte
    val bad2 = file.clone()
    bad2(bad2.length - 1) = (bad2(bad2.length - 1) ^ 0x7f).toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.gunzipMembers(3L, bad2)
    }
    // nonzero FLG (FNAME etc.) is out of profile
    val bad3 = file.clone()
    bad3(3) = 0x08.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.gunzipMembers(4L, bad3)
    }
  }

  test("q269 permissive gzip: quarantine + resync, good members live") {
    val recs = Seq(
      MultimodalOps.encodeWarcResponseRecord(1L,
        "alpha".getBytes("US-ASCII")),
      MultimodalOps.encodeWarcResponseRecord(2L,
        "bravo team".getBytes("US-ASCII")),
      MultimodalOps.encodeWarcResponseRecord(3L,
        "charlie".getBytes("US-ASCII")))
    val ms = recs.map(MultimodalOps.gzipMember)
    // flip one deflate byte in the MIDDLE member
    val bad = ms(1).clone(); bad(14) = (bad(14) ^ 0x55).toByte
    val file = ms(0) ++ bad ++ ms(2)
    val (good, q) = MultimodalOps.gunzipMembersPermissive(9L, file)
    assert(q == 1 && good.size == 2,
      s"quarantined=$q good=${good.size}")
    assert(java.util.Arrays.equals(good(0), recs(0)))
    assert(java.util.Arrays.equals(good(1), recs(2)))
    // a clean file quarantines nothing
    val (g2, q2) = MultimodalOps.gunzipMembersPermissive(9L,
      ms.flatten.toArray)
    assert(q2 == 0 && g2.size == 3)
  }

  test("q274 animated GIF: frames, delays, loop count; malformed FAIL") {
    // 3 frames of 8 bytes; distinct first bytes drive the delays
    val payload = (Array[Int](10, 1, 2, 3, 4, 5, 6, 7,
      250, 9, 9, 9, 9, 9, 9, 9, 99, 0, 0, 0, 0, 0, 0, 200)
      ).map(_.toByte)
    val gif = MultimodalOps.encodeGifAnim(12L, payload)
    val d = MultimodalOps.decodeGifAnim(12L, gif)
    assert(d.n_frames == 3 && d.loop_count == (12 % 5))
    // delays: 1+10%100=11, 1+250%100=51, 1+99%100=100
    assert(d.total_delay_cs == 11L + 51L + 100L)
    assert(d.n_pixels == 24)
    assert(d.first_frame_mean == (10 + 1 + 2 + 3 + 4 + 5 + 6 + 7) / 8.0)
    assert(d.last_frame_mean == (99 + 200) / 8.0)
    val want = payload.zipWithIndex
      .map { case (b, i) => (i + 1).toLong * (b & 0xff) }.sum
    assert(d.pos_sum == want)
    // a frame whose GCE was dropped must fail (splice the second
    // frame's 8-byte GCE block out: 0x21 0xF9 04 .. 00)
    val s = gif.map(_ & 0xff)
    var at = -1
    var seen = 0
    var i = 0
    while (at < 0 && i < s.length - 1) {
      if (s(i) == 0x21 && s(i + 1) == 0xF9) {
        seen += 1; if (seen == 2) at = i
      }
      i += 1
    }
    assert(at > 0)
    val spliced = gif.take(at) ++ gif.drop(at + 8)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeGifAnim(13L, spliced)
    }
    // unknown application extension is rejected, not skipped blind
    val alien = gif.clone()
    val appAt = new String(gif, "ISO-8859-1").indexOf("NETSCAPE2.0")
    alien(appAt) = 'X'.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeGifAnim(14L, alien)
    }
  }

  test("q278 MP4 boxes: largesize path, moov recursion, strict walk") {
    val mp4 = MultimodalOps.encodeMp4(23L, 200)
    val d = MultimodalOps.decodeMp4(23L, mp4)
    assert(d.n_boxes == 4 && d.brand == "isom")
    assert(d.timescale == 1000L)
    assert(d.duration_units == 40L * 200 + 23 % 40)
    assert(d.duration_ms == d.duration_units) // timescale 1000
    assert(d.next_track_id == 2 + 23 % 5)
    assert(d.free_bytes == 200 % 64) // carried via u64 largesize
    // size-0 (to-EOF) boxes are out of grammar: zero the ftyp size
    val z = mp4.clone()
    java.nio.ByteBuffer.wrap(z).putInt(0, 0)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeMp4(1L, z)
    }
    // a box size overrunning the file
    val o = mp4.clone()
    java.nio.ByteBuffer.wrap(o).putInt(0, 100000)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeMp4(2L, o)
    }
    // mvhd version 1 (64-bit times) is out of the fixture's grammar
    val v1 = mp4.clone()
    val at = new String(v1, "ISO-8859-1").indexOf("mvhd")
    v1(at + 4) = 1.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeMp4(3L, v1)
    }
    // truncated: drop the last byte of mvhd
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeMp4(4L, mp4.dropRight(1))
    }
  }

  test("q277 paletted PNG: PLTE verified, grammar enforced both ways") {
    val payload = Array.tabulate(24)(i => (i * 9).toByte)
    val png = MultimodalOps.encodePngPal(payload)
    val d = MultimodalOps.decodePngPal(30L, png)
    assert(d.width == 4 && d.height == 6 && d.n_palette == 256)
    val want = payload.map(_ & 0xff).sum.toDouble / 24
    assert(math.abs(d.mean_index - want) < 1e-12)
    assert(d.top_left_index == 0)
    assert(d.pos_sum == payload.zipWithIndex
      .map { case (b, i) => (i + 1).toLong * (b & 0xff) }.sum)
    // a gray (type 0) stream through the paletted wrapper fails
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePngPal(31L, MultimodalOps.encodePng(payload))
    }
    // corrupt ONE palette entry: content check must catch it (fix
    // the chunk CRC so only the ramp check can object)
    val bad = png.clone()
    val plteAt = 8 + 25 // after IHDR chunk (12 + 13)
    assert(new String(bad, plteAt + 4, 4, "US-ASCII") == "PLTE")
    bad(plteAt + 8 + 30) = 99.toByte
    val crc = new java.util.zip.CRC32()
    crc.update(bad, plteAt + 4, 4 + 768)
    val cv = crc.getValue.toInt
    val bb = java.nio.ByteBuffer.wrap(bad)
    bb.putInt(plteAt + 8 + 768, cv)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePngPal(32L, bad)
    }
  }

  test("q276 FLAC STREAMINFO: misaligned bit group, block walk, strict") {
    val flac = MultimodalOps.encodeFlac(77L, 123)
    val d = MultimodalOps.decodeFlac(77L, flac)
    assert(d.sample_rate == 44100 && d.channels == 2) // 77 % 2 = 1
    assert(d.bits_per_sample == 16)
    assert(d.total_samples == 123L * 100 + 77 % 37)
    assert(d.duration_us == d.total_samples * 1000000L / 44100)
    assert(d.min_frame_size == 14 && d.max_frame_size == 14 + 23)
    assert(d.n_blocks == 2 && d.padding_bytes == 123 % 50)
    // PADDING must be zero — a nonzero byte is corruption
    val bad = flac.clone()
    bad(bad.length - 1) = 1.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeFlac(1L, bad)
    }
    // STREAMINFO-first is a spec MUST: flip block 0's type to 2
    val oo = flac.clone()
    oo(4) = 0x02.toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeFlac(2L, oo)
    }
    // type 127 is reserved-invalid (make it the FIRST block to hit
    // the invalid-type check... it trips STREAMINFO-first; patch the
    // PADDING block instead: offset 4+4+34)
    val inv = flac.clone()
    inv(42) = (0x80 | 0x7f).toByte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeFlac(3L, inv)
    }
    // truncated: drop the final padding byte
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeFlac(4L, flac.dropRight(1))
    }
  }

  test("q273 EXIF: segment-relative TIFF parse, sub-IFD hop, strict") {
    val jpg = MultimodalOps.encodeExif(125L, 307)
    val d = MultimodalOps.decodeExif(125L, jpg)
    assert(d.orientation == (1 + 125 % 8))
    assert(d.datetime == "2026:08:15 12:05:35") // 125%60=5, 875%60=35
    assert(d.exposure_num == 1L && d.exposure_den == 308L)
    assert(d.pixel_x == 307L)
    assert(d.n_ifd0_tags == 3 && d.n_exif_tags == 2)
    // a JPEG with no APP1 (SOI + DQT + EOI) must fail, not default
    val noApp1 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0xff); out.write(0xd8)
      out.write(0xff); out.write(0xdb); out.write(0); out.write(67)
      out.write(0); (0 until 64).foreach(_ => out.write(8))
      out.write(0xff); out.write(0xd9)
      out.toByteArray
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeExif(1L, noApp1)
    }
    // wrong signature (XMP lives in APP1 too — must be rejected)
    val xmp = jpg.clone()
    xmp(6) = 'X'.toByte // 'E' of "Exif" at SOI(2)+marker(2)+len(2)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeExif(2L, xmp)
    }
    // RATIONAL offset past the segment end
    val over = jpg.clone()
    // ExposureTime entry value field: t0 + 50 (ExifIFD) + 2 + 8
    val t0 = 2 + 2 + 2 + 6
    java.nio.ByteBuffer.wrap(over)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(t0 + 50 + 2 + 8, 100000)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeExif(3L, over)
    }
  }

  test("q272 codec matrix: zstd/lz4/snappy round-trip, exact features") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog once more"
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val rows = operators.MultimodalOps.codecMatrix(docs).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("lz4", "snappy", "zstd"))
    val t = text.getBytes("US-ASCII")
    val n = t.length
    val c1 = t.zipWithIndex.map { case (b, i) => (i + 1L) * (b & 0xff) }
      .sum
    val c0 = t.map(b => (b & 0xff).toLong).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("orig_bytes") == 4L * n)
      // 4-copy closed form: 4·Σ j·b_j + 6n·Σ b_j
      assert(r.getAs[Long]("checksum") == 4L * c1 + 6L * n * c0)
      assert(r.getAs[Boolean]("roundtrip_smaller"),
        s"${r.getString(1)} did not compress a 4x-repeated payload")
    }
  }

  test("q262 TIFF: multi-strip external arrays; strip order pinned") {
    // 5 rows of 5 px → 3 strips (2+2+1 rows), arrays OUT-OF-LINE
    val payload = Array.tabulate(25)(i => (i + 3).toByte)
    val tiff = MultimodalOps.encodeTiff(payload)
    // 8 header + 25 raster + 2×(3×4) external arrays + 114 IFD
    assert(tiff.length == 8 + 25 + 24 + 114)
    val d = MultimodalOps.decodeTiff(20L, tiff)
    assert(d.width == 5 && d.height == 5 && d.n_strips == 3)
    assert(d.n_bytes == tiff.length && d.n_pixels == 25)
    val want = payload.map(_ & 0xff).sum.toDouble / 25
    assert(math.abs(d.mean_gray - want) < 1e-12)
    assert(d.top_left_gray == 3)
    // 1-based position checksum — fails a strip walk out of order
    val pos = payload.zipWithIndex
      .map { case (b, i) => (i + 1).toLong * (b & 0xff) }.sum
    assert(d.pos_sum == pos)
    // swapping the two external strip OFFSETS (at bytes 33..40)
    // walks strips out of order: geometry still checks out but the
    // position checksum must move
    val swapped = tiff.clone()
    val bb = java.nio.ByteBuffer.wrap(swapped)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val o0 = bb.getInt(33); val o1 = bb.getInt(37)
    bb.putInt(33, o1); bb.putInt(37, o0)
    assert(MultimodalOps.decodeTiff(21L, swapped).pos_sum != pos)
  }

  test("q262 TIFF: inline arrays at h<=2; zero rows; malformed FAIL") {
    // 2 rows → 1 strip: offsets/counts fit INLINE in the IFD field
    val inl = MultimodalOps.encodeTiff(Array.tabulate(10)(_.toByte))
    assert(inl.length == 8 + 10 + 114) // no external arrays
    val di = MultimodalOps.decodeTiff(22L, inl)
    assert(di.height == 2 && di.n_strips == 1 && di.pos_sum ==
      (0 until 10).map(i => (i + 1).toLong * i).sum)
    // < 1 row → zero pixels, zero counted strips
    val z = MultimodalOps.decodeTiff(23L,
      MultimodalOps.encodeTiff(Array[Byte](1, 2)))
    assert(z.height == 0 && z.n_strips == 0 && z.mean_gray == 0.0)
    val good = MultimodalOps.encodeTiff(Array.tabulate(25)(_.toByte))
    // bad byte-order mark
    intercept[IllegalArgumentException] {
      val bad = good.clone(); bad(0) = 'X'.toByte
      MultimodalOps.decodeTiff(24L, bad)
    }
    // compression ≠ 1 (entry 3 value field: IFD+2+3·12+8, u16 LE)
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      val b = java.nio.ByteBuffer.wrap(bad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = b.getInt(4)
      b.putShort(ifd + 2 + 3 * 12 + 8, 5) // LZW
      MultimodalOps.decodeTiff(25L, bad)
    }
    // strip out of bounds (first external offset pushed past EOF)
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      val b = java.nio.ByteBuffer.wrap(bad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(33, bad.length)
      MultimodalOps.decodeTiff(26L, bad)
    }
    // IFD tag order violated (swap the first two entry TAGS)
    intercept[IllegalArgumentException] {
      val bad = good.clone()
      val b = java.nio.ByteBuffer.wrap(bad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = b.getInt(4)
      b.putShort(ifd + 2, 257); b.putShort(ifd + 2 + 12, 256)
      MultimodalOps.decodeTiff(27L, bad)
    }
  }

  test("q284 tfrecord: framing round-trip; both CRCs load-bearing") {
    import operators.MultimodalOps.{decodeTfRecordShard,
      encodeTfRecordShard}
    val members = Seq(
      5L -> "hello tfrecord".getBytes("US-ASCII"),
      6L -> "x".getBytes("US-ASCII"))
    val s = encodeTfRecordShard(members)
    // layout: 16 framing + len("5\n")+14, then 16 + len("6\n")+1
    assert(s.length == (16 + 2 + 14) + (16 + 2 + 1))
    val got = decodeTfRecordShard(1L, s)
    assert(got.map(r => (r.doc_id, r.text_bytes)) ==
      Seq((5L, 14), (6L, 1)))
    assert(got.head.byte_sum ==
      "hello tfrecord".getBytes.map(_ & 0xff).map(_.toLong).sum)
    // flip a payload byte -> payload CRC fails
    val badP = s.clone(); badP(12 + 3) = (badP(15) ^ 0x01).toByte
    intercept[IllegalArgumentException] { decodeTfRecordShard(2L, badP) }
    // flip a length byte -> length CRC fails (before any overrun read)
    val badL = s.clone(); badL(0) = (badL(0) ^ 0x01).toByte
    intercept[IllegalArgumentException] { decodeTfRecordShard(3L, badL) }
    // truncate mid-record
    intercept[IllegalArgumentException] {
      decodeTfRecordShard(4L, java.util.Arrays.copyOf(s, s.length - 2))
    }
  }

  test("q290 mp3: syncsafe tag + frame walk; corruption fails loud") {
    import operators.MultimodalOps.{decodeMp3, encodeMp3}
    val good = encodeMp3(42L, 7)
    val p = decodeMp3(42L, good)
    assert(p.title == "doc 42" && p.n_frames == 7L)
    assert(p.id3_bytes == 10 + 10 + 1 + "doc 42".length)
    assert(p.total_samples == 1152L * 7)
    assert(p.duration_ms == 1152L * 7 * 1000 / 44100)
    // kbps cycle from (42+f)%5: f=0 -> idx2=192 ...
    assert(p.bitrate_kbps_sum == (0 until 7)
      .map(f => Array(128, 160, 192, 224, 256)(((42 + f) % 5).toInt))
      .sum)
    // a non-syncsafe size byte (high bit set) is refused
    val badSize = good.clone(); badSize(9) = 0x80.toByte
    intercept[IllegalArgumentException] { decodeMp3(1L, badSize) }
    // lost sync mid-stream
    val badSync = good.clone()
    badSync(p.id3_bytes) = 0x00.toByte
    intercept[IllegalArgumentException] { decodeMp3(2L, badSync) }
    // truncated final frame
    intercept[IllegalArgumentException] {
      decodeMp3(3L, java.util.Arrays.copyOf(good, good.length - 3))
    }
    // free-format bitrate index (0) is refused
    val badBr = good.clone()
    badBr(p.id3_bytes + 2) = (badBr(p.id3_bytes + 2) & 0x0f).toByte
    intercept[IllegalArgumentException] { decodeMp3(4L, badBr) }
  }

  test("q291 proto: wire walk cross-checks are load-bearing") {
    import operators.MultimodalOps.{decodeProto, encodeProto}
    val text = "hello proto world".getBytes("US-ASCII")
    val lens = Array(5, 5, 5)
    val good = encodeProto(9L, text, lens)
    val p = decodeProto(9L, good)
    assert(p.n_fields == 5 && p.text_bytes == 17 && p.n_tokens == 3)
    assert(p.packed_sum == 15L)
    assert(p.checksum == text.map(_ & 0xff).map(_.toLong).sum)
    assert(p.msg_bytes == good.length)
    // carried id mismatch
    intercept[IllegalArgumentException] { decodeProto(8L, good) }
    // flip a text byte -> fixed64 checksum cross-check fails
    val badT = good.clone(); badT(4) = (badT(4) ^ 0x01).toByte
    intercept[IllegalArgumentException] { decodeProto(9L, badT) }
    // truncate inside the fixed32 tail
    intercept[IllegalArgumentException] {
      decodeProto(9L, java.util.Arrays.copyOf(good, good.length - 2))
    }
    // unknown field/wire combination
    val badW = good.clone(); badW(0) = 0x10.toByte // field 2, wire 0
    intercept[IllegalArgumentException] { decodeProto(9L, badW) }
    // token too long for the 1-byte packed grammar is refused at
    // encode time (fail loud beats silent multi-byte varints)
    intercept[IllegalArgumentException] {
      encodeProto(9L, text, Array(200))
    }
  }

  test("q304 sniffer: all six identified blind; junk fails loud") {
    import operators.MultimodalOps._
    val t = "some text payload for sniffing ok".getBytes("US-ASCII")
    assert(sniffAndDecode(0L, encodeBmp(t))._1 == "bmp")
    assert(sniffAndDecode(1L, encodeOgg(1L, t))._1 == "ogg")
    assert(sniffAndDecode(2L,
      encodeTfRecordShard(Seq((2L, t))))._1 == "tfrecord")
    assert(sniffAndDecode(3L, encodeZipShard(Seq((3L, t))))._1 == "zip")
    assert(sniffAndDecode(4L, encodeMp3(4L, 5))._1 == "mp3")
    assert(sniffAndDecode(5L, encodeIco(t))._1 == "ico")
    // junk matches no magic, no ICONDIR shape, and cannot fake the
    // TFRecord length CRC — the fallback refuses it loudly
    intercept[IllegalArgumentException] {
      sniffAndDecode(9L, Array.tabulate(64)(i => (i * 7 + 13).toByte))
    }
  }

  test("q307 webp: VP8L dims round-trip exactly; RIFF grammar is " +
      "load-bearing") {
    import operators.MultimodalOps.{decodeWebp, encodeWebp,
      sniffAndDecode}
    val data = "vp8l opaque entropy payload".getBytes("US-ASCII")
    val good = encodeWebp(641, 333, data)
    val m = decodeWebp(7L, good)
    assert(m.width == 641 && m.height == 333)
    assert(m.data_bytes == data.length)
    assert(m.byte_sum == data.map(_ & 0xff).map(_.toLong).sum)
    // the sniffer routes on RIFF + WEBP form type and packs the dims
    assert(sniffAndDecode(7L, good) == ("webp", 641L * 100000L + 333L))
    // 14-bit boundary dims survive the packed header
    val edge = decodeWebp(8L, encodeWebp(16384, 1, data))
    assert(edge.width == 16384 && edge.height == 1)
    // odd VP8L body (5 + even data makes body odd): pad byte honored
    val odd = encodeWebp(3, 2, data.take(4))
    assert(odd.length % 2 == 0 && decodeWebp(9L, odd).width == 3)
    // grammar violations fail loud: bad signature, wrong RIFF size,
    // non-WEBP form type (a WAV must NOT reach the VP8L path)
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(20) = 0x2e; decodeWebp(7L, b)
    }
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(4) = (b(4) + 1).toByte; decodeWebp(7L, b)
    }
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(8) = 'W'; b(9) = 'A'; b(10) = 'V'
      b(11) = 'E'; decodeWebp(7L, b)
    }
    intercept[IllegalArgumentException] { encodeWebp(16385, 1, data) }
  }

  test("q307 avif: ftyp-brand rule + box walk; ispe dims + mdat " +
      "byte sum exact") {
    import operators.MultimodalOps.{decodeAvif, encodeAvif,
      sniffAndDecode}
    val data = "av1 still image payload bytes".getBytes("US-ASCII")
    val good = encodeAvif(37L, 641, 333, data) // 37 % 32 = 5 free pads
    val m = decodeAvif(37L, good)
    assert(m.brand == "avif" && m.n_boxes == 4 && m.free_bytes == 5)
    assert(m.width == 641 && m.height == 333,
      "dims must round-trip through the meta/iprp/ipco/ispe chain")
    assert(m.mdat_bytes == data.length)
    assert(m.byte_sum == data.map(_ & 0xff).map(_.toLong).sum)
    assert(sniffAndDecode(37L, good) == ("avif", m.byte_sum))
    // first-box-must-be-ftyp and brand rules are enforced
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(8) = 'i'; b(9) = 's'; b(10) = 'o'
      b(11) = 'm'; decodeAvif(37L, b)
    }
    // a truncated tail (box overrun) fails loud
    intercept[IllegalArgumentException] {
      decodeAvif(37L, good.dropRight(3))
    }
    // the dimension chain is load-bearing: renaming ispe (no dims),
    // a non-pict handler, and a nonzero ispe version all fail loud
    val ispeAt = good.indexOfSlice("ispe".getBytes("US-ASCII"))
    val hdlrTypeAt =
      good.indexOfSlice("pict".getBytes("US-ASCII"))
    assert(ispeAt > 0 && hdlrTypeAt > 0)
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(ispeAt) = 'x'; decodeAvif(37L, b)
    }
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(hdlrTypeAt) = 'v'; decodeAvif(37L, b)
    }
    intercept[IllegalArgumentException] {
      val b = good.clone(); b(ispeAt + 4) = 1; decodeAvif(37L, b)
    }
    intercept[IllegalArgumentException] { encodeAvif(37L, 0, 5, data) }
  }

  test("q307 pipeline matches the closed form on real docs") {
    import operators.MultimodalOps.sniffModernImages
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
    val got = sniffModernImages(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = docs.collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      val text = r.getAs[String]("text")
      val bytes = text.getBytes("UTF-8")
      val w = 1L + (bytes.length % 1000)
      val h = 1L + (text.trim.split("\\s+").length % 500)
      if (id % 2 == 0) (id, "webp", w * 100000L + h, w, h)
      else (id, "avif", bytes.map(_ & 0xff).map(_.toLong).sum, w, h)
    }
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq)
  }

  test("q302 ico: doubled-height quirk + AND-mask transparency " +
      "are load-bearing") {
    import operators.MultimodalOps.{decodeIco, encodeIco}
    val payload = Array.tabulate(9 * 5 + 4)(i => (i % 83).toByte)
    val good = encodeIco(payload)
    val p = decodeIco(1L, good)
    assert(p.n_icons == 1 && p.width == 3 && p.height == 5 &&
      p.bpp == 24)
    assert(p.ico_bytes == 62 + 16 * 5 && p.ico_bytes == good.length)
    assert(p.mean_pixel ==
      payload.take(45).map(_ & 0xff).sum.toDouble / 45)
    assert(p.top_left_blue == (payload(0) & 0xff))
    // tall payloads cap at the 32-row height-byte bound
    assert(decodeIco(2L, encodeIco(new Array[Byte](9 * 50))).height
      == 32)
    // un-double the DIB height: a plain-BMP reuse must be refused
    val flat = good.clone()
    val bb = java.nio.ByteBuffer.wrap(flat)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22 + 8, 5)
    intercept[IllegalArgumentException] { decodeIco(3L, flat) }
    // dirty AND mask (a stray opaque bit)
    val dirty = good.clone(); dirty(dirty.length - 2) = 0x80.toByte
    intercept[IllegalArgumentException] { decodeIco(4L, dirty) }
    // trailing bytes after the declared resource
    intercept[IllegalArgumentException] {
      decodeIco(5L, good ++ Array[Byte](1))
    }
    // truncated raster
    intercept[IllegalArgumentException] {
      decodeIco(6L, java.util.Arrays.copyOf(good, good.length - 3))
    }
  }

  test("q295 ogg: lacing edges + flag discipline + the non-zlib CRC") {
    import operators.MultimodalOps.{decodeOgg, encodeOgg}
    // 510 bytes = exactly 2×255 → THREE segments (0-size tail rule),
    // 2 pages; 100 bytes → 1 segment, 1 page
    val payload510 = Array.tabulate(510)(i => (i % 97).toByte)
    val p2 = decodeOgg(7L, encodeOgg(7L, payload510))
    assert(p2.n_segments == 3 && p2.n_pages == 2)
    assert(p2.payload_bytes == 510)
    assert(p2.file_bytes == 27 * 2 + 3 + 510)
    val p1 = decodeOgg(8L, encodeOgg(8L, Array.fill(100)(1.toByte)))
    assert(p1.n_segments == 1 && p1.n_pages == 1)
    // flip a payload byte -> page CRC fails
    val good = encodeOgg(9L, payload510)
    val bad = good.clone(); bad(40) = (bad(40) ^ 0x10).toByte
    intercept[IllegalArgumentException] { decodeOgg(9L, bad) }
    // wrong serial (stream mixup) is refused
    intercept[IllegalArgumentException] { decodeOgg(10L, good) }
    // drop the final page entirely (first page has a valid CRC but
    // no EOS): the walk must notice the stream never terminated
    var second = 4
    while (!(good(second) == 'O' && good(second + 1) == 'g' &&
      good(second + 2) == 'g' && good(second + 3) == 'S')) second += 1
    intercept[IllegalArgumentException] {
      decodeOgg(9L, java.util.Arrays.copyOf(good, second))
    }
  }

  test("q285 zip: EOCD/CD/LFH walk; every cross-check load-bearing") {
    import operators.MultimodalOps.{decodeZipShard, encodeZipShard}
    val members = Seq(
      2L -> "stored entry payload".getBytes("US-ASCII"), // even: stored
      3L -> "deflate entry payload".getBytes("US-ASCII")) // odd: deflate
    val z = encodeZipShard(members)
    val got = decodeZipShard(1L, z)
    assert(got.map(r => (r.doc_id, r.method)) ==
      Seq((2L, "stored"), (3L, "deflate")))
    assert(got.forall(r => r.usize == (if (r.doc_id == 2L) 80 else 84)))
    assert(got.find(_.doc_id == 3L).get.deflate_smaller)
    assert(!got.find(_.doc_id == 2L).get.deflate_smaller)
    // flip a stored data byte -> CRC32 fails
    val badData = z.clone()
    badData(30 + 8) = (badData(30 + 8) ^ 0x40).toByte // inside doc2 data
    intercept[IllegalArgumentException] { decodeZipShard(2L, badData) }
    // tamper the LFH method field -> CD/LFH mismatch
    val badM = z.clone(); badM(8) = 8.toByte
    intercept[IllegalArgumentException] { decodeZipShard(3L, badM) }
    // truncate the EOCD
    intercept[IllegalArgumentException] {
      decodeZipShard(4L, java.util.Arrays.copyOf(z, z.length - 4))
    }
    // trailing garbage breaks the EOCD comment-length consistency
    intercept[IllegalArgumentException] {
      decodeZipShard(5L, z ++ Array.fill(3)(0x7f.toByte))
    }
  }
}
