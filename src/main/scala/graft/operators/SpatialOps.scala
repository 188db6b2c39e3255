package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Spatial operators — the geo-blocking family a training-data
  * pipeline needs the moment records carry coordinates (store/POI
  * conflation, geo-dedup, coverage audits). The reference engine has
  * no spatial executor; these are supersets built the Spark-first
  * way: GRID-BLOCKED joins (candidate volume bounded by cell density,
  * never |A|·|B|) and exact-integer geometry predicates (ray casting
  * with BIGINT cross products — no float ever decides containment).
  *
  * Coordinates are derived deterministically from table keys via the
  * md5-uniform idiom (reference fixture style: vector.slt seeds its
  * arrays; here md5(c_custkey) seeds a [0,10000)² integer plane) so
  * Spark and the DuckDB oracle generate bit-identical geometry with
  * zero new test data.
  */
object SpatialOps {

  /** The integer plane: 10000×10000; grid cell edge = radius so a
    * 3×3 neighborhood covers every candidate. */
  private val Side = 10000L
  private val Radius = 400L
  private val R2 = Radius * Radius

  /** Deterministic coordinate in [0, Side) from a salted key hash —
    * Spark side of the shared md5-uniform geometry. */
  private def coord(salt: String, key: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(salt), key)), 1, 8), 16, 10)
      .cast("long") % Side

  /** DuckDB side of the same coordinate — MUST mirror [[coord]]. */
  private def coordSql(salt: String, key: String) =
    s"('0x' || md5('$salt' || $key)[1:8])::BIGINT % $Side"

  /** The q208 polygon fixture: a simple CONCAVE hexagon (two reflex
    * notches) as (x1,y1)→(x2,y2) edges, closed. Concavity matters:
    * bounding-box or convex-hull shortcuts would misclassify, so the
    * oracle really exercises ray casting. */
  private[graft] val polyEdges: Seq[(Long, Long, Long, Long)] = {
    val v = Seq((1000L, 1000L), (9000L, 2000L), (5000L, 5000L),
      (9000L, 8000L), (1000L, 9000L), (4000L, 5000L))
    v.zip(v.tail :+ v.head).map { case ((a, b), (c, d)) => (a, b, c, d) }
  }

  /** Exact-integer ray-cast containment: for each (id, x, y) point
    * row, add `inside` = (# upward/downward edge crossings of the
    * rightward ray) odd. The crossing test is the half-open rule
    * ((y1>py) != (y2>py)) with the intersection comparison cleared of
    * division by the BIGINT cross product cr = (px-x1)(y2-y1) -
    * (x2-x1)(py-y1) — sign-adjusted by edge direction. Pure integer:
    * Spark and DuckDB agree bit-for-bit, including points exactly on
    * an edge (both engines apply the same rule, so the oracle match
    * is total). Edges arrive as a broadcast literal table (O(edges)
    * rows) — the crossJoin is a broadcast nested loop over a
    * handful of rows per point, codegen-friendly, no shuffle. */
  private[graft] def pointInPolygon(points: DataFrame,
      edges: Seq[(Long, Long, Long, Long)]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val e = broadcast(edges.toDF("x1", "y1", "x2", "y2"))
    val cr = (col("x") - col("x1")) * (col("y2") - col("y1")) -
      (col("x2") - col("x1")) * (col("y") - col("y1"))
    val crossing = ((col("y1") > col("y")) =!= (col("y2") > col("y"))) &&
      (((col("y2") > col("y1")) && cr < 0L) ||
        ((col("y2") < col("y1")) && cr > 0L))
    points.crossJoin(e)
      .groupBy(points.columns.map(col).toSeq: _*)
      .agg(sum(when(crossing, 1L).otherwise(0L)).as("crossings"))
      .withColumn("inside", col("crossings") % 2L === 1L)
      .drop("crossings")
  }

  /** Grid-blocked radius join core: facilities explode to their 3×3
    * cell neighborhood (cell edge == radius, so every point within R
    * of a facility shares one of those 9 cells), points map to ONE
    * cell, and the equi-join on (cx, cy) bounds candidates by local
    * density — never |points|·|facilities|. The exact d² ≤ R² filter
    * runs on BIGINT. Split out so SpatialOpsSpec pins the cell-cover
    * guarantee (blocked == naive on a planted corner case). */
  private[graft] def gridRadiusJoin(points: DataFrame,
      facilities: DataFrame, radius: Long): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val r2 = radius * radius
    val p = points  // `div`, not `/`: Spark `/` on longs is DOUBLE
      .withColumn("cx", expr(s"x div $radius"))
      .withColumn("cy", expr(s"y div $radius"))
    val offs = broadcast(
      (for { dx <- -1L to 1L; dy <- -1L to 1L } yield (dx, dy))
        .toDF("dx", "dy"))
    val f = facilities.crossJoin(offs)
      .select(col("fid"), col("fx"), col("fy"),
        (expr(s"fx div $radius") + col("dx")).as("cx"),
        (expr(s"fy div $radius") + col("dy")).as("cy"))
    val d2 = (col("x") - col("fx")) * (col("x") - col("fx")) +
      (col("y") - col("fy")) * (col("y") - col("fy"))
    // facility-cell side is |facilities|·9 — broadcast at dim scale;
    // at 100TB with a large facility side this becomes a shuffle
    // equi-join on (cx, cy), which is exactly the blocked shape.
    p.join(broadcast(f), Seq("cx", "cy"))
      .filter(d2 <= r2)
      .groupBy("fid")
      .agg(count(lit(1)).as("n_within"), min(d2).as("min_d2"))
  }

  /** q280's zone vertices: one simple STAR-SHAPED octagon per nation
    * — vertices at the eight fixed angular directions E, NE, N, NW,
    * W, SW, S, SE (strictly increasing angle) around an md5-placed
    * center, each at its own md5 radius in [500, 3500). Monotone
    * angles make the polygon SIMPLE by construction at any radii,
    * and the CCW direction order makes the shoelace sum positive —
    * engine-independent integer facts the spec pins. */
  private[graft] val ZoneDirs: Seq[(Int, Long, Long)] = Seq(
    (0, 1L, 0L), (1, 1L, 1L), (2, 0L, 1L), (3, -1L, 1L),
    (4, -1L, 0L), (5, -1L, -1L), (6, 0L, -1L), (7, 1L, -1L))

  private def zoneVertices(nations: DataFrame): DataFrame = {
    val spark = nations.sparkSession
    import spark.implicits._
    val dirs = broadcast(ZoneDirs.toDF("k", "dx", "dy"))
    val r = conv(substring(md5(concat(lit("zr:"), col("n"), lit(":"),
      col("k"))), 1, 8), 16, 10).cast("long") % 3000L + 500L
    nations.crossJoin(dirs)
      .select(col("n"), col("k"),
        (coord("zx:", col("n")) + col("dx") * r).as("x"),
        (coord("zy:", col("n")) + col("dy") * r).as("y"))
  }

  /** q280's full pipeline over a nations frame + a points frame:
    * exact shoelace geometry per zone (signed 2·area, centroid
    * numerators — division deferred so everything stays BIGINT) and
    * the point-in-OWN-zone census (each customer ray-cast against
    * its nation's polygon — the keyed variant of q208's broadcast
    * rule). Zone edge tables are |nations|·8 rows and broadcast; the
    * point side sees one narrow 8× join, no shuffle beyond the final
    * per-nation agg. */
  private[graft] def zoneCensus(nations: DataFrame, pts: DataFrame)
      : DataFrame = {
    val verts = zoneVertices(nations)
    val nxt = verts.select(col("n"), ((col("k") + 7) % 8).as("k"),
      col("x").as("x2"), col("y").as("y2"))
    val edges = verts.join(nxt, Seq("n", "k"))
      .select(col("n"), col("x").as("x1"), col("y").as("y1"),
        col("x2"), col("y2"))
    val cross = col("x1") * col("y2") - col("x2") * col("y1")
    val geom = edges.groupBy("n").agg(
      count(lit(1)).cast("int").as("n_vertices"),
      sum(cross).as("area2"),
      sum((col("x1") + col("x2")) * cross).as("cx_num"),
      sum((col("y1") + col("y2")) * cross).as("cy_num"))
    val pe = pts.join(broadcast(edges), Seq("n"))
    val cr = (col("x") - col("x1")) * (col("y2") - col("y1")) -
      (col("x2") - col("x1")) * (col("y") - col("y1"))
    val crossing =
      ((col("y1") > col("y")) =!= (col("y2") > col("y"))) &&
        (((col("y2") > col("y1")) && cr < 0L) ||
          ((col("y2") < col("y1")) && cr > 0L))
    val census = pe.groupBy("n", "pid")
      .agg((sum(when(crossing, 1L).otherwise(0L)) % 2L === 1L)
        .as("inside"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"))
    geom.join(census, Seq("n"))
      .select(col("n").as("nationkey"), col("n_vertices"),
        col("area2"), col("cx_num"), col("cy_num"),
        col("n_points"), col("n_inside"))
      .orderBy("nationkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GRID-BLOCKED RADIUS JOIN — the spatial join shape (PostGIS
    // ST_DWithin / GeoSpark DistanceJoin): for every supplier
    // "facility", count the customer "points" within Euclidean
    // distance R on the md5-derived integer plane, plus the exact
    // nearest distance². The all-pairs join is the scale-killer this
    // family exists to avoid; the grid join's candidate volume is
    // (points per cell)·9 per facility. Only facilities with ≥1
    // point in range appear (inner-join semantics, documented).
    "q207_grid_radius_join" -> ((s, d) => {
      val pts = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("pid"),
          coord("px:", col("c_custkey")).as("x"),
          coord("py:", col("c_custkey")).as("y"))
      val fac = Tables.load(s, d, "supplier")
        .select(col("s_suppkey").as("fid"),
          coord("sx:", col("s_suppkey")).as("fx"),
          coord("sy:", col("s_suppkey")).as("fy"))
      gridRadiusJoin(pts, fac, Radius)
        .select(col("fid").as("s_suppkey"), col("n_within"),
          col("min_d2"))
        .orderBy("s_suppkey")
    }),

    // POINT-IN-POLYGON — exact-integer ray casting against a concave
    // polygon fixture, aggregated per nation (the geo-coverage audit:
    // which customer segments fall inside a service region). One
    // broadcast nested loop over 6 edge rows + one aggregate; no
    // float ever decides a containment bit, so the oracle match is
    // exact even for on-edge points.
    "q208_point_in_polygon" -> ((s, d) => {
      val pts = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("pid"), col("c_nationkey"),
          coord("px:", col("c_custkey")).as("x"),
          coord("py:", col("c_custkey")).as("y"))
      pointInPolygon(pts, polyEdges)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_points"),
          sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"))
        .orderBy("c_nationkey")
    }),

    // PER-NATION zone geometry + membership census: one simple
    // star-shaped octagon per nation (md5 center + per-vertex md5
    // radii), exact shoelace 2·area and centroid NUMERATORS (BIGINT
    // — the division is the reader's), and each customer ray-cast
    // against ITS OWN nation's polygon. The per-group-polygon shape
    // q208's single fixed hexagon doesn't exercise.
    "q280_zone_census" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
      val nations = cust.select(col("c_nationkey").as("n")).distinct()
      val pts = cust.select(col("c_nationkey").as("n"),
        col("c_custkey").as("pid"),
        coord("px:", col("c_custkey")).as("x"),
        coord("py:", col("c_custkey")).as("y"))
      zoneCensus(nations, pts)
    })
  )

  private def polyValuesSql: String =
    polyEdges.map { case (a, b, c, d) => s"($a, $b, $c, $d)" }
      .mkString(", ")

  def oracles: Map[String, String] = Map(

    // naive exact join — same md5 geometry, same BIGINT d² filter;
    // fine at oracle scale, which is the point of the blocked Spark
    // plan existing at all
    "q207_grid_radius_join" ->
      s"""WITH pts AS (
  SELECT c_custkey AS pid,
    ${coordSql("px:", "c_custkey")} AS x,
    ${coordSql("py:", "c_custkey")} AS y
  FROM customer
), fac AS (
  SELECT s_suppkey,
    ${coordSql("sx:", "s_suppkey")} AS fx,
    ${coordSql("sy:", "s_suppkey")} AS fy
  FROM supplier
)
SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_within,
  min((x - fx) * (x - fx) + (y - fy) * (y - fy)) AS min_d2
FROM pts, fac
WHERE (x - fx) * (x - fx) + (y - fy) * (y - fy) <= $R2
GROUP BY s_suppkey""",

    // q280: same md5 geometry, same crossing rule, polygons rebuilt
    // from the direction table + per-vertex radii; everything BIGINT
    "q280_zone_census" ->
      s"""WITH dirs(k, dx, dy) AS (VALUES
  (0,1,0),(1,1,1),(2,0,1),(3,-1,1),(4,-1,0),(5,-1,-1),(6,0,-1),(7,1,-1)),
nat AS (SELECT DISTINCT c_nationkey AS n FROM customer),
v AS (
  SELECT n, k,
    ${coordSql("zx:", "n")} + dx *
      (('0x' || md5('zr:' || n || ':' || k)[1:8])::BIGINT % 3000 + 500)
      AS x,
    ${coordSql("zy:", "n")} + dy *
      (('0x' || md5('zr:' || n || ':' || k)[1:8])::BIGINT % 3000 + 500)
      AS y
  FROM nat CROSS JOIN dirs
),
e AS (
  SELECT a.n, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM v a JOIN v b ON b.n = a.n AND b.k = (a.k + 1) % 8
),
geom AS (
  SELECT n, count(*)::INT AS n_vertices,
    sum(x1*y2 - x2*y1)::BIGINT AS area2,
    sum((x1 + x2) * (x1*y2 - x2*y1))::BIGINT AS cx_num,
    sum((y1 + y2) * (x1*y2 - x2*y1))::BIGINT AS cy_num
  FROM e GROUP BY n
),
pts AS (
  SELECT c_nationkey AS n, c_custkey AS pid,
    ${coordSql("px:", "c_custkey")} AS x,
    ${coordSql("py:", "c_custkey")} AS y
  FROM customer
),
flags AS (
  SELECT p.n, p.pid,
    sum(CASE WHEN ((y1 > y) != (y2 > y)) AND
        (((y2 > y1) AND (x - x1)*(y2 - y1) - (x2 - x1)*(y - y1) < 0)
         OR ((y2 < y1) AND (x - x1)*(y2 - y1) - (x2 - x1)*(y - y1) > 0))
      THEN 1 ELSE 0 END) % 2 = 1 AS inside
  FROM pts p JOIN e ON e.n = p.n
  GROUP BY p.n, p.pid
),
census AS (
  SELECT n, count(*)::BIGINT AS n_points,
    sum(CASE WHEN inside THEN 1 ELSE 0 END)::BIGINT AS n_inside
  FROM flags GROUP BY n
)
SELECT g.n AS nationkey, g.n_vertices, g.area2, g.cx_num, g.cy_num,
  c.n_points, c.n_inside
FROM geom g JOIN census c ON c.n = g.n
ORDER BY nationkey""",

    // same half-open crossing rule and integer cross product
    "q208_point_in_polygon" ->
      s"""WITH pts AS (
  SELECT c_custkey AS pid, c_nationkey,
    ${coordSql("px:", "c_custkey")} AS x,
    ${coordSql("py:", "c_custkey")} AS y
  FROM customer
), e(x1, y1, x2, y2) AS (VALUES $polyValuesSql),
flags AS (
  SELECT pid, c_nationkey,
    sum(CASE WHEN ((y1 > y) != (y2 > y)) AND
          (((y2 > y1) AND (x - x1) * (y2 - y1) - (x2 - x1) * (y - y1) < 0)
           OR ((y2 < y1) AND (x - x1) * (y2 - y1) - (x2 - x1) * (y - y1) > 0))
        THEN 1 ELSE 0 END) % 2 = 1 AS inside
  FROM pts, e
  GROUP BY pid, c_nationkey
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_points,
  CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
FROM flags
GROUP BY c_nationkey"""
  )
}
