package graft.operators

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial self-join without a cross product: grid-cell blocking +
 * exact haversine — "all entity pairs within R km", the
 * store-coverage / user-proximity / duplicate-POI primitive.
 *
 * Scale shape mirrors the LSH band join: each point lands in ONE
 * integer (lat, lon) cell; one side explodes into the neighbor-cell
 * window big enough to cover R at the corpus's worst-case latitude
 * (lat span = ceil(R/(111.32·cell)), lon span additionally divided by
 * cos(max |lat|) — the meridian convergence that a naive 3×3 probe
 * gets wrong), and candidates join on cell EQUALITY before one exact
 * haversine filter. Never a pairwise matrix; the fan-out is the fixed
 * window size. Distances round to 4dp km so both engines' libm trig
 * agrees through the threshold compare.
 *
 * Known limits (documented, not silent): cells do not wrap at the
 * ±180° antimeridian (a corpus straddling it needs a shifted
 * longitude frame), and the polar guard below rejects |lat| ≥ 89°
 * where lon cells degenerate.
 */
object Geo {

  val EarthRadiusKm = 6371.0088

  /** Exact haversine distance in km between two (lat, lon) degree
    * pairs, as a column expression (shared by operator and callers). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1) / 2
    val dlon = radians(lon2 - lon1) / 2
    lit(2 * EarthRadiusKm) * asin(sqrt(
      sin(dlat) * sin(dlat) +
        cos(radians(lat1)) * cos(radians(lat2)) * sin(dlon) * sin(dlon)))
  }

  /**
   * Nearest-site lookup: each point matched to its closest entry of a
   * small `sites` table (stores, warehouses, cells) by exact haversine
   * — the assignment/coverage query. Sites are model-sized by
   * assumption and broadcast; the argmin is a max-of-struct on
   * (−distance, −site_id), ONE aggregate, no window sort. Ties go to
   * the smaller site id.
   */
  def nearestSite(points: DataFrame, idCol: String, latCol: String,
      lonCol: String, sites: DataFrame, siteIdCol: String,
      siteLatCol: String, siteLonCol: String): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val s = sites.select(col(siteIdCol).cast("long").as("site_id"),
      col(siteLatCol).cast("double").as("slat"),
      col(siteLonCol).cast("double").as("slon"))
    points.select(col(idCol).cast("long").as("id"),
        col(latCol).cast("double").as("lat"), col(lonCol).cast("double").as("lon"))
      .crossJoin(broadcast(s))
      .withColumn("d", round(haversineKm($"lat", $"lon", $"slat", $"slon"), 4))
      .groupBy($"id")
      .agg(max(struct((-$"d").as("negd"), (-$"site_id").as("negid"))).as("__best"))
      .select($"id".as(idCol), (-$"__best.negid").as("site_id"),
        (-$"__best.negd").as("distance_km"))
  }

  /**
   * All (id_a < id_b) pairs within `radiusKm`, with the 4dp distance.
   * `cellDeg` tunes the grid (default 1°≈111 km cells).
   */
  def geoNeighbors(df: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusKm: Double, cellDeg: Double = 1.0): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0, "radiusKm and cellDeg must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(idCol).cast("long").as("id"),
        col(latCol).cast("double").as("lat"), col(lonCol).cast("double").as("lon"))
      .ckptSer()
    val maxAbsLat = pts.agg(max(abs($"lat"))).head().getDouble(0)
    require(maxAbsLat < 89.0, "polar caps need a different index (cells degenerate)")
    val latSpan = math.ceil(radiusKm / (111.32 * cellDeg)).toInt
    val lonSpan = math.ceil(
      radiusKm / (111.32 * math.cos(math.toRadians(maxAbsLat)) * cellDeg)).toInt
    val cellLat = floor($"lat" / cellDeg).cast("long")
    val cellLon = floor($"lon" / cellDeg).cast("long")
    val a = pts.select($"id".as("id_a"), $"lat".as("lat_a"), $"lon".as("lon_a"),
      cellLat.as("cla"), cellLon.as("clo"))
    val b = pts.select($"id".as("id_b"), $"lat".as("lat_b"), $"lon".as("lon_b"),
        cellLat.as("cla0"), cellLon.as("clo0"))
      .withColumn("cla", explode(array((-latSpan to latSpan).map($"cla0" + _): _*)))
      .withColumn("clo", explode(array((-lonSpan to lonSpan).map($"clo0" + _): _*)))
    a.join(b, Seq("cla", "clo"))
      .filter($"id_a" < $"id_b")
      .withColumn("distance_km",
        round(haversineKm($"lat_a", $"lon_a", $"lat_b", $"lon_b"), 4))
      .filter($"distance_km" <= radiusKm)
      .select($"id_a", $"id_b", $"distance_km")
  }
}
