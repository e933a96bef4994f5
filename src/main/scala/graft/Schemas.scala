package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.types.StructType

/** The six reference tables (SURVEY §1.3; DDL `sql/create_tables.sql:15-125`)
  * as case classes — the typed `Dataset[T]` surface of the engine. Option
  * fields encode the load-bearing nullability: NULL service tag
  * (route.py:35-37), NULL stop name/location (agency.py:160-170).
  *
  * PostGIS `GEOMETRY(POINT,4326)` maps to a (lon, lat) struct: the reference
  * only constructs points and compares their text form (§1.2 F9/G8).
  */
object Schemas {

  case class Point(lon: Double, lat: Double)

  case class Agency(agency_id: String, name: String, region: String)

  case class Route(route_id: String, agency_id: String, tag: String, name: String)

  case class Service(service_id: String, route_id: String, tag: Option[String],
                     name: String, direction: Option[String], use_for_ui: Boolean)

  case class Stop(stop_id: String, route_id: String, tag: String,
                  name: Option[String], location: Option[Point])

  case class ServiceStopOrder(service_id: String, stop_id: String,
                              stop_order: Int, update_timestamp: java.sql.Timestamp)

  case class VehicleLocation(service_id: String, vehicle_tag: String,
                             vehicle_location: Option[Point],
                             location_timestamp: java.sql.Timestamp,
                             is_predictable: Boolean)

  /** StructTypes derived from the encoders — single source of truth. */
  def schemaOf[T](e: Encoder[T]): StructType = e.schema

  import org.apache.spark.sql.Encoders
  lazy val agency: StructType = schemaOf(Encoders.product[Agency])
  lazy val route: StructType = schemaOf(Encoders.product[Route])
  lazy val service: StructType = schemaOf(Encoders.product[Service])
  lazy val stop: StructType = schemaOf(Encoders.product[Stop])
  lazy val serviceStopOrder: StructType = schemaOf(Encoders.product[ServiceStopOrder])
  lazy val vehicleLocation: StructType = schemaOf(Encoders.product[VehicleLocation])
}
