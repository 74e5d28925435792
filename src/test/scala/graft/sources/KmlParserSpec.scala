package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's guard semantics (task.ts:95-112); fixture
  * shapes from FIXTURES.md §A1. Pure — no Spark session. */
class KmlParserSpec extends AnyFunSuite {

  def kml(placemarks: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<kml xmlns="http://www.opengis.net/kml/2.2">
       |  <Document><Folder>$placemarks</Folder></Document>
       |</kml>""".stripMargin

  val fullPlacemark: String =
    """<Placemark>
      |  <TimeStamp><when>2026-08-12T05:00:00Z</when></TimeStamp>
      |  <Point><coordinates>-105.123,39.456,1650.0</coordinates></Point>
      |  <ExtendedData>
      |    <Data name="Id"><value>12345678</value></Data>
      |    <Data name="Name"><value>Jane Operator</value></Data>
      |    <Data name="Device Type"><value>inReach Mini 2</value></Data>
      |    <Data name="IMEI"><value>300434030000000</value></Data>
      |    <Data name="Incident Id"><value></value></Data>
      |    <Data name="Valid GPS Fix"><value>True</value></Data>
      |    <Data name="Course"><value>45.00 ° True</value></Data>
      |    <Data name="Velocity"><value>5.5 km/h</value></Data>
      |  </ExtendedData>
      |</Placemark>""".stripMargin

  test("full placemark extracts coordinates, when, extended map") {
    val rows = KmlParser.parse(kml(fullPlacemark), "share1", "CS")
    assert(rows.size == 1)
    val r = rows.head
    assert(r.shareId == "share1" && r.callSign == "CS")
    assert(r.coordinatesRaw.contains("-105.123,39.456,1650.0"))
    assert(r.whenRaw.contains("2026-08-12T05:00:00Z"))
    assert(r.extended("IMEI") == "300434030000000")
    assert(r.extended("Course") == "45.00 ° True")
    assert(r.extended("Incident Id") == "") // empty <value> → ""
  }

  test("blank body → empty (task.ts:95)") {
    assert(KmlParser.parse("", "s", "c").isEmpty)
    assert(KmlParser.parse("   \n ", "s", "c").isEmpty)
  }

  test("no Document → throw (task.ts:98)") {
    intercept[KmlParser.KmlDocumentNotFound] {
      KmlParser.parse("<kml><NotDocument/></kml>", "s", "c")
    }
  }

  test("Document without Folder → silent empty (task.ts:99)") {
    assert(KmlParser.parse("<kml><Document/></kml>", "s", "c").isEmpty)
  }

  test("placemark without Point → coordinatesRaw None (filtered later, task.ts:103)") {
    val pm = """<Placemark><TimeStamp><when>2026-08-12T05:00:00Z</when></TimeStamp></Placemark>"""
    val rows = KmlParser.parse(kml(pm), "s", "c")
    assert(rows.size == 1 && rows.head.coordinatesRaw.isEmpty)
  }

  test("missing when / missing ExtendedData tolerated") {
    val pm = """<Placemark><Point><coordinates>1,2</coordinates></Point></Placemark>"""
    val rows = KmlParser.parse(kml(pm), "s", "c")
    assert(rows.head.whenRaw.isEmpty && rows.head.extended.isEmpty)
  }

  test("multiple placemarks all extracted in document order") {
    val pm2 = fullPlacemark.replace("300434030000000", "300434030000001")
    val rows = KmlParser.parse(kml(fullPlacemark + pm2), "s", "c")
    assert(rows.map(_.extended("IMEI")) ==
      Seq("300434030000000", "300434030000001"))
  }
}
