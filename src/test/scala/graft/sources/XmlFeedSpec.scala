package graft.sources

import graft.SparkTestBase

/** Fixture-XML parsing tests against the reference's document shapes
  * (FIXTURES.md §A.2), including every edge the reference guards: missing
  * stop referenced only by a direction, absent lastTime → '0', NULL-tag
  * synthetic service, predictable flag parse.
  */
class XmlFeedSpec extends SparkTestBase {

  private def df(xml: String*) = {
    val session = spark
    import session.implicits._
    xml.toDF("xml")
  }

  test("agencyList → (tag, title, region) rows") {
    val session = spark
    import session.implicits._
    val out = XmlFeed.parseAgencyList(df(
      """<body><agency tag="sf-muni" title="San Francisco Muni" regionTitle="California-Northern"/>
        |<agency tag="ttc" title="Toronto TTC" regionTitle="Ontario"/></body>""".stripMargin))
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("sf-muni", "San Francisco Muni", "California-Northern"),
      ("ttc", "Toronto TTC", "Ontario")))
  }

  test("routeConfig: body stops, ordered direction refs, missing-stop anti-join") {
    val session = spark
    import session.implicits._
    val doc =
      """<body><route tag="N">
        |  <stop tag="5240" title="Judah St &amp; 9th Ave" lon="-122.4665" lat="37.7616"/>
        |  <direction tag="N__OB1" title="Outbound to Ocean Beach" name="Outbound" useForUI="true">
        |    <stop tag="5240"/><stop tag="9999"/>
        |  </direction>
        |</route></body>""".stripMargin
    val stops = XmlFeed.parseBodyStops(df(doc))
      .as[(String, String, String, Double, Double)].collect().toSeq
    assert(stops == Seq(("N", "5240", "Judah St & 9th Ave", -122.4665, 37.7616)))

    val orders = XmlFeed.parseStopOrders(df(doc))
      .as[(String, String, String, Int)].collect().toSeq
    assert(orders == Seq(("N", "N__OB1", "5240", 1), ("N", "N__OB1", "9999", 2)),
      "document order must become stop_order 1..n")

    val missing = XmlFeed.missingStops(df(doc)).as[(String, String)].collect().toSeq
    assert(missing == Seq(("N", "9999")), "stop referenced but absent from body")
  }

  test("routeConfig services include the synthetic NULL-tag not-running row") {
    val session = spark
    import session.implicits._
    val doc =
      """<body><route tag="N">
        |  <direction tag="N__OB1" title="Outbound" name="Outbound" useForUI="true"/>
        |</route></body>""".stripMargin
    val svcs = XmlFeed.parseServices(df(doc))
      .as[(String, Option[String], String, Option[String], Boolean)].collect().toSet
    assert(svcs == Set(
      ("N", Some("N__OB1"), "Outbound", Some("Outbound"), true),
      ("N", None, "not running a service", None, false)))
  }

  test("vehicleLocations: attrs, predictable flag, lastTime offset") {
    val session = spark
    import session.implicits._
    val out = XmlFeed.parseVehicleLocations(df(
      """<body>
        |  <vehicle id="1412" dirTag="N__OB1" lon="-122.4367" lat="37.7624" secsSinceReport="9" predictable="true"/>
        |  <vehicle id="1413" dirTag="N__IB1" lon="-122.44" lat="37.76" secsSinceReport="21" predictable="false"/>
        |  <lastTime time="1554927504522"/>
        |</body>""".stripMargin))
      .as[(String, String, Double, Double, Double, Boolean, String)].collect().toSet
    assert(out == Set(
      ("1412", "N__OB1", -122.4367, 37.7624, 9.0, true, "1554927504522"),
      ("1413", "N__IB1", -122.44, 37.76, 21.0, false, "1554927504522")))
  }

  test("vehicleLocations without lastTime falls back to offset '0' (route.py:168-170)") {
    val session = spark
    import session.implicits._
    val out = XmlFeed.parseVehicleLocations(df(
      """<body><vehicle id="1" dirTag="d" lon="0.0" lat="0.0" secsSinceReport="1" predictable="true"/></body>"""))
      .select("last_time").as[String].collect().toSeq
    assert(out == Seq("0"))
  }
}
