package graft.operators

import graft.model.RawPlacemark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** P1–P9: raw placemark rows → GeoJSON Feature rows (SURVEY.md §2.2).
  *
  * Entirely native `Column` expressions — zero UDFs — so predicate
  * pushdown, column pruning and whole-stage codegen all stay in play
  * (SURVEY.md §7.1 design stance).
  */
object FeatureProjection {

  /** P5: strip a unit suffix ("45.00 deg True" -> "45.00") and cast —
    * the reference's whitespace-onward regex replace + Number()
    * (`task.ts:119-120`). NaN from Number('') becomes null here
    * (declarative analog; documented deviation SURVEY.md 7.4). */
  def stripUnitSuffix(c: Column): Column =
    regexp_replace(c, "\\s.*", "").cast("double")

  /** P6: km/h → m/s (reference `task.ts:120`). */
  val KmhToMs = 0.277778

  /** P2: "lon,lat[,alt]" → array<double> (reference `task.ts:105-107`). */
  def parseCoordinates(c: Column): Column =
    transform(split(c, ","), x => x.cast("double"))

  /** P1 + P9: the wide projection (reference `task.ts:115-149`).
    * Input columns: shareId, callSign, coordinatesRaw, whenRaw,
    * extended (map<string,string>). */
  def project(raw: Dataset[RawPlacemark]): DataFrame = {
    val ext = col("extended")
    val when = to_timestamp(col("whenRaw")) // P7, task.ts:122
    val id = concat(lit("inreach-"), ext("IMEI")) // P4, task.ts:114
    raw
      .filter(col("coordinatesRaw").isNotNull) // P1: Point-only, task.ts:103
      .select(
        id.as("id"),
        lit("Feature").as("type"),
        struct(
          stripUnitSuffix(ext("Course")).as("course"), // task.ts:119
          (stripUnitSuffix(ext("Velocity")) * lit(KmhToMs)).as("speed"), // task.ts:120
          col("callSign").as("callsign"),
          when.as("time"),
          when.as("start"),
          array(struct( // P8: portal back-link, task.ts:124-131
            id.as("uid"),
            lit("r-u").as("relation"),
            lit("text/html").as("mime"),
            concat(lit("https://share.garmin.com/"), col("shareId")).as("url"),
            lit("Garmin Portal").as("remarks"))).as("links"),
          struct( // metadata, task.ts:132-143
            ext("Id").as("inreachId"),
            ext("Name").as("inreachName"),
            ext("Device Type").as("inreachDeviceType"),
            ext("IMEI").as("inreachIMEI"),
            ext("Incident Id").as("inreachIncidentId"),
            ext("Valid GPS Fix").as("inreachValidFix"),
            ext("Text").as("inreachText"),
            ext("Event").as("inreachEvent"),
            ext("Device Identifier").as("inreachDeviceId"),
            when.as("inreachReceive")).as("metadata")).as("properties"),
        struct( // geometry, task.ts:145-148
          lit("Point").as("type"),
          parseCoordinates(col("coordinatesRaw")).as("coordinates")).as("geometry"))
  }
}
