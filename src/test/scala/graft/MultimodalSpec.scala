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
}
