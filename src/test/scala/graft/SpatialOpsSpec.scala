package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialOps

/** The spatial family's geometry invariants, pinned on crafted
  * coordinates where the answer is checkable by hand: ray casting on
  * convex and CONCAVE polygons (the notch is what bounding-box
  * shortcuts get wrong), and the grid join's 3×3 cell-cover guarantee
  * (blocked == naive, including pairs exactly on the radius and
  * neighbors straddling a cell boundary). */
class SpatialOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val square = // (0,0)-(10,10) axis square
    Seq((0L, 0L, 10L, 0L), (10L, 0L, 10L, 10L),
      (10L, 10L, 0L, 10L), (0L, 10L, 0L, 0L))

  /** L-shape: (0,0)→(10,0)→(10,10)→(6,10)→(6,4)→(0,4)→close.
    * The region x∈[6,10] is full height; x∈[0,6] only up to y=4. */
  private val lShape = {
    val v = Seq((0L, 0L), (10L, 0L), (10L, 10L), (6L, 10L),
      (6L, 4L), (0L, 4L))
    v.zip(v.tail :+ v.head).map { case ((a, b), (c, d)) => (a, b, c, d) }
  }

  private def classify(pts: Seq[(Long, Long, Long)],
      poly: Seq[(Long, Long, Long, Long)]): Map[Long, Boolean] =
    SpatialOps.pointInPolygon(
      pts.toDF("pid", "x", "y"), poly)
      .collect().map(r => r.getAs[Long]("pid") ->
        r.getAs[Boolean]("inside")).toMap

  test("ray cast: square interior/exterior/far classification") {
    val got = classify(Seq((1L, 5L, 5L), (2L, 15L, 5L), (3L, 5L, 15L),
      (4L, -3L, 5L), (5L, 9L, 9L)), square)
    assert(got(1L) && got(5L) && !got(2L) && !got(3L) && !got(4L))
  }

  test("ray cast: concave notch is OUTSIDE (bounding box would say in)") {
    val got = classify(Seq(
      (1L, 2L, 8L),   // in the notch: inside bbox, outside polygon
      (2L, 2L, 2L),   // lower arm
      (3L, 8L, 8L),   // tall arm
      (4L, 8L, 2L)),  // lower-right
      lShape)
    assert(!got(1L) && got(2L) && got(3L) && got(4L))
  }

  test("ray cast: vertex-on-ray and on-edge points classify consistently " +
      "under the half-open rule in both orientations") {
    // point level with vertex (6,4): ray passes through the vertex;
    // half-open (y1>py)!=(y2>py) counts the vertex's two edges once
    // iff they straddle — no double count
    val got = classify(Seq((1L, 1L, 4L), (2L, 7L, 4L)), lShape)
    // y=4 is the top edge of the left arm: half-open rule puts
    // (1,4) on the boundary deterministically; (7,4) is interior of
    // the tall arm (its span there is y∈[0,10])
    assert(got(2L))
    // reversed vertex order must classify identically (rule is
    // orientation-independent)
    val rev = lShape.reverse.map { case (a, b, c, d) => (c, d, a, b) }
    assert(classify(Seq((1L, 1L, 4L), (2L, 7L, 4L)), rev) == got)
  }

  test("grid radius join == naive all-pairs on boundary-heavy fixture") {
    val r = 10L
    // pairs exactly AT the radius (d2 == r²: 6-8-10 triangle), just
    // inside, just outside, and neighbors straddling cell boundaries
    val pts = Seq(
      (1L, 16L, 18L),  // d2=100 from f1 (10,10): exactly ON the radius
      (2L, 19L, 19L),  // same cell as f1 but d2=162: exact filter cuts it
      (3L, 21L, 10L),  // next cell over, d2=121: outside
      (4L, 9L, 9L),    // cell (0,0), d2=2: inside via neighbor cell
      (5L, 100L, 100L) // near f2 only
    ).toDF("pid", "x", "y")
    val fac = Seq((1L, 10L, 10L), (2L, 102L, 101L))
      .toDF("fid", "fx", "fy")
    val blocked = SpatialOps.gridRadiusJoin(pts, fac, r)
      .collect().map(x => (x.getAs[Long]("fid"),
        x.getAs[Long]("n_within"), x.getAs[Long]("min_d2"))).toSet
    val d2 = (col("x") - col("fx")) * (col("x") - col("fx")) +
      (col("y") - col("fy")) * (col("y") - col("fy"))
    val naive = pts.crossJoin(fac).filter(d2 <= r * r)
      .groupBy("fid")
      .agg(count(lit(1)).as("n"), min(d2).as("m"))
      .collect().map(x => (x.getAs[Long]("fid"), x.getAs[Long]("n"),
        x.getAs[Long]("m"))).toSet
    assert(blocked == naive)
    assert(blocked == Set((1L, 2L, 2L), (2L, 1L, 5L)))
  }

  test("q280 zones: Scala-rebuilt shoelace exact; census tiles points") {
    def md5_8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val side = 10000L
    def verts(n: Long): Seq[(Long, Long)] = {
      val cx = md5_8(s"zx:$n") % side
      val cy = md5_8(s"zy:$n") % side
      operators.SpatialOps.ZoneDirs.map { case (k, dx, dy) =>
        val r = md5_8(s"zr:$n:$k") % 3000 + 500
        (cx + dx * r, cy + dy * r)
      }
    }
    val rows = operators.SpatialOps
      .queries("q280_zone_census")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var totalPts = 0L
    rows.foreach { r =>
      val n = r.get(0).asInstanceOf[Number].longValue
      val v = verts(n)
      val cls = v.tail :+ v.head
      val shoe = v.zip(cls)
        .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum
      assert(shoe > 0, s"nation $n: CCW orientation broken")
      assert(r.getAs[Long]("area2") == shoe, s"nation $n area")
      val cxn = v.zip(cls).map { case ((x1, y1), (x2, y2)) =>
        (x1 + x2) * (x1 * y2 - x2 * y1) }.sum
      assert(r.getAs[Long]("cx_num") == cxn, s"nation $n centroid")
      assert(r.getAs[Int]("n_vertices") == 8)
      assert(r.getAs[Long]("n_inside") <= r.getAs[Long]("n_points"))
      totalPts += r.getAs[Long]("n_points")
    }
    // every customer is censused against exactly its own zone
    val nCust = Tables.load(spark, sfDir, "customer").count()
    assert(totalPts == nCust, s"$totalPts != $nCust")
    // somewhere across nations, zones actually capture points
    assert(rows.map(_.getAs[Long]("n_inside")).sum > 0)
  }
}
