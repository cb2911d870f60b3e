package graft.graph

/** Travel-speed model: km/h by (mode, highway class).
  *
  * Semantics mirror the reference's speed table (reference:
  * rust/src/lib.rs:43-98) and main-road classification (rust/src/lib.rs:100-118).
  * A `None` speed means the way is not traversable in that mode and is dropped
  * from the graph for that mode.
  *
  * Beyond the Rust blueprint's three modes, the reference's Valhalla side
  * exposes the full costing list (`truck`, `taxi`, `bus`, `motorcycle`,
  * `motor_scooter` — reference README.md:160, ITALY.md:238-245). Those are
  * modeled here as Valhalla-flavored profiles: heavy vehicles (truck/bus)
  * track auto with a lower cruising ceiling and are barred from
  * living_street, so a truck route is never faster than the car route over
  * the same feasible set (ITALY.md's golden: car 2.4 h vs truck 2.5 h on
  * the identical 273.2 km route — ratio ≈ 1.04, matched by the ~0.93×
  * class speeds below); taxi/motorcycle share the auto profile;
  * motor_scooter is the low-power profile (no motorways, 45 km/h cap).
  */
object SpeedModel {
  /** Modes built by default for every graph load (the reference's
    * multi-mode golden set, ITALY.md:222-245).
    */
  final val Modes: Seq[String] = Seq("auto", "truck", "bicycle", "pedestrian")

  /** Remaining Valhalla costing names; accepted whenever a load names them
    * explicitly (`RoutingContext.loadParquet(..., modes)`), not built by
    * default — per-mode graphs cost memory and the golden set covers the
    * distinct profiles.
    */
  final val ExtraModes: Seq[String] = Seq("taxi", "bus", "motorcycle", "motor_scooter")

  def speedKmh(highway: String, mode: String): Option[Double] = mode match {
    case "taxi" | "motorcycle" => speedKmh(highway, "auto") // auto profile
    case "truck" | "bus" => // heavy-vehicle profile
      highway match {
        case "motorway"       => Some(112.0)
        case "motorway_link"  => Some(72.0)
        case "trunk"          => Some(93.0)
        case "trunk_link"     => Some(55.0)
        case "primary"        => Some(72.0)
        case "primary_link"   => Some(45.0)
        case "secondary"      => Some(54.0)
        case "secondary_link" => Some(36.0)
        case "tertiary"       => Some(45.0)
        case "tertiary_link"  => Some(27.0)
        case "residential"    => Some(24.0)
        case "living_street"  => None // heavy vehicles barred
        case "service"        => Some(15.0)
        case "unclassified"   => Some(36.0)
        case _                => None
      }
    case "motor_scooter" => // low-power: no motorways, 45 km/h ceiling
      highway match {
        case "motorway" | "motorway_link" => None
        case h => speedKmh(h, "auto").map(math.min(_, 45.0))
      }
    case "auto" =>
      highway match {
        case "motorway"       => Some(120.0)
        case "motorway_link"  => Some(80.0)
        case "trunk"          => Some(100.0)
        case "trunk_link"     => Some(60.0)
        case "primary"        => Some(80.0)
        case "primary_link"   => Some(50.0)
        case "secondary"      => Some(60.0)
        case "secondary_link" => Some(40.0)
        case "tertiary"       => Some(50.0)
        case "tertiary_link"  => Some(30.0)
        case "residential"    => Some(30.0)
        case "living_street"  => Some(20.0)
        case "service"        => Some(20.0)
        case "unclassified"   => Some(40.0)
        case _                => None
      }
    case "bicycle" =>
      highway match {
        case "cycleway"                         => Some(20.0)
        case "path"                             => Some(15.0)
        case "track"                            => Some(12.0)
        case "bridleway"                        => Some(10.0)
        case "residential"                      => Some(18.0)
        case "living_street"                    => Some(15.0)
        case "service"                          => Some(15.0)
        case "tertiary" | "tertiary_link"       => Some(20.0)
        case "secondary" | "secondary_link"     => Some(18.0)
        case "primary" | "primary_link"         => Some(15.0)
        case "unclassified"                     => Some(18.0)
        case "trunk" | "trunk_link"             => Some(12.0)
        case "motorway" | "motorway_link"       => Some(5.0)
        case "footway"                          => Some(10.0)
        case "pedestrian"                       => Some(8.0)
        case "steps"                            => Some(3.0)
        case _                                  => None
      }
    case "pedestrian" =>
      highway match {
        case "footway"                                             => Some(5.0)
        case "path"                                                => Some(4.5)
        case "pedestrian"                                          => Some(5.0)
        case "steps"                                               => Some(3.0)
        case "track" | "bridleway"                                 => Some(4.0)
        case "residential" | "living_street" | "service" | "cycleway" => Some(5.0)
        case "tertiary" | "tertiary_link"                          => Some(5.0)
        case "secondary" | "secondary_link"                        => Some(5.0)
        case "primary" | "primary_link"                            => Some(5.0)
        case "unclassified"                                        => Some(5.0)
        case "trunk" | "trunk_link"                                => Some(5.0)
        case "motorway" | "motorway_link"                          => Some(3.0)
        case _                                                     => None
      }
    case _ => None
  }

  /** Only main-road nodes enter the snap index, so snaps never land on
    * disconnected footpaths (reference: rust/src/lib.rs:100-118,233-241).
    */
  final val MainRoads: Seq[String] = Seq(
    "motorway", "motorway_link", "trunk", "trunk_link", "primary",
    "primary_link", "secondary", "secondary_link", "tertiary",
    "tertiary_link", "residential", "living_street", "service",
    "unclassified")

  private val mainRoadSet = MainRoads.toSet

  def isMainRoad(highway: String): Boolean = mainRoadSet(highway)

  /** Edge weight in ms: dist_m at speed → travel time, truncated like the
    * reference (reference: rust/src/lib.rs:199-205, `as u32` truncation).
    */
  def timeMs(distM: Double, speedKmh: Double): Long =
    ((distM / 1000.0 / speedKmh) * 3600.0 * 1000.0).toLong
}
