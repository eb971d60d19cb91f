package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}

/** Geospatial primitives over plain lat/lon columns — the minimum a
  * curation/analytics engine needs once a dimension carries
  * coordinates (the `StarSchema.dimAirport` latitude/longitude): a
  * great-circle distance expression and a grid-bucketed radius
  * self-join that never goes quadratic.
  *
  * Determinism contract: the RADIUS JOIN works in PLANAR DEGREE space
  * with pure IEEE arithmetic (+, −, ×, sqrt are exactly-rounded by
  * IEEE 754, so Spark and any SQL oracle agree bit-for-bit), while
  * [[haversineKm]] — which needs sin/cos/asin, transcendentals with no
  * cross-engine bit guarantee — is the library expression for REAL
  * distances, spec-pinned against textbook values instead of
  * hash-gated. Planar degrees are the standard blocking metric for
  * "nearby" filters at city/region scale; callers needing metric
  * radii post-filter the candidate pairs with [[haversineKm]].
  */
object Geo {

  /** Haversine great-circle distance in kilometers between two
    * (degree) coordinate pairs — mean-Earth-radius 6371.0088 km:
    * 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))). Pure
    * `sf.functions` trig inside whole-stage codegen; transcendental,
    * so library-surface only (spec-pinned, not oracle-hashed). */
  def haversineKm(lat1: org.apache.spark.sql.Column, lon1: org.apache.spark.sql.Column,
                  lat2: org.apache.spark.sql.Column, lon2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dLat = sf.radians(lat2 - lat1) / 2
    val dLon = sf.radians(lon2 - lon1) / 2
    val a = sf.sin(dLat) * sf.sin(dLat) +
      sf.cos(sf.radians(lat1)) * sf.cos(sf.radians(lat2)) *
        sf.sin(dLon) * sf.sin(dLon)
    sf.lit(2 * 6371.0088) * sf.asin(sf.sqrt(a))
  }

  /** All point pairs within `radiusDeg` PLANAR degrees of each other
    * (Euclidean over (lat, lon)), via grid-cell bucketing — the
    * scale-safe twin of the quadratic self-join: each point lands in
    * one ⌊coord/radius⌋ grid cell; the LEFT side expands to its 3×3
    * cell neighborhood, the RIGHT side stays home, and a pair at
    * distance ≤ r ALWAYS shares one (expanded, home) cell pair (each
    * axis differs by ≤ r ⇒ cell index differs by ≤ 1) — so the join is
    * cell-keyed equi, candidate volume is bounded by local density,
    * and each unordered pair is emitted exactly once (expanded id <
    * home id; the home cell is unique per point).
    *
    * Determinism: cell ids are ⌊x/r⌋ of IEEE divides; the distance
    * test dlat² + dlon² ≤ r² and the emitted distance √(dlat²+dlon²)
    * are exactly-rounded IEEE arithmetic — bit-identical in any
    * IEEE-754 SQL engine, no transcendentals anywhere.
    *
    * Scale shape: one map-only cell assignment, a 9× bounded fan-out
    * on one side, one cell-keyed equi join (AQE broadcasts a small
    * side), no windows; the quadratic term lives only WITHIN a cell
    * neighborhood — bounded by density × r², the standard spatial
    * blocking guarantee. NULL coordinates drop (no cell). */
  def withinRadiusPairs(df: DataFrame, idCol: String, latCol: String,
                        lonCol: String, radiusDeg: Double): DataFrame = {
    require(radiusDeg > 0, s"radiusDeg must be > 0, got $radiusDeg")
    val pts = df.select(sf.col(idCol).as("__id"),
        sf.col(latCol).cast("double").as("__lat"),
        sf.col(lonCol).cast("double").as("__lon"))
      .filter(sf.col("__lat").isNotNull && sf.col("__lon").isNotNull)
    val r = sf.lit(radiusDeg)
    val home = pts.select(sf.col("__id").as("id_b"),
      sf.col("__lat").as("lat_b"), sf.col("__lon").as("lon_b"),
      sf.floor(sf.col("__lat") / r).as("cy"),
      sf.floor(sf.col("__lon") / r).as("cx"))
    val expanded = pts.select(sf.col("__id").as("id_a"),
        sf.col("__lat").as("lat_a"), sf.col("__lon").as("lon_a"),
        sf.explode(sf.array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
          sf.struct((sf.floor(sf.col("__lat") / r) + dy).as("cy"),
            (sf.floor(sf.col("__lon") / r) + dx).as("cx")))): _*)).as("c"))
      .select(sf.col("id_a"), sf.col("lat_a"), sf.col("lon_a"),
        sf.col("c.cy").as("cy"), sf.col("c.cx").as("cx"))
    val dLat = sf.col("lat_a") - sf.col("lat_b")
    val dLon = sf.col("lon_a") - sf.col("lon_b")
    expanded.join(home, Seq("cy", "cx"))
      .filter(sf.col("id_a") < sf.col("id_b"))
      .filter(dLat * dLat + dLon * dLon <= r * r)
      .select(sf.col("id_a"), sf.col("id_b"),
        gf.roundAt(sf.sqrt(dLat * dLat + dLon * dLon), 6).as("dist_deg"))
      .orderBy("id_a", "id_b")
  }
}
