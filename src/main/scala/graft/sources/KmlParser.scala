package graft.sources

import graft.model.RawPlacemark
import scala.xml.{Elem, Node, XML}

/** Pure KML → RawPlacemark extraction. No Spark dependency — this is
  * the partition-level parse function of the inReach source
  * (SURVEY.md §2.1 S6–S8) and is unit-testable without a session.
  *
  * Guard semantics pinned to the reference:
  *  - blank body  → empty result          (reference `task.ts:95`)
  *  - no Document → throw                  (`task.ts:98`; caught per
  *    feed by the source's failure isolation, `task.ts:165-168`)
  *  - no Folder   → empty result           (`task.ts:99`)
  *  - placemark without Point → skipped    (`task.ts:103`)
  *
  * xml2js wraps every element in an array (`Folder[0].Placemark`);
  * scala.xml does not — normalization note in SURVEY.md §7.4. The
  * reference reads only Document[0].Folder[0] (first folder).
  */
object KmlParser {

  final class KmlDocumentNotFound
      extends RuntimeException("XML Parse Error: Document not found")

  def parse(body: String, shareId: String, callSign: String): Seq[RawPlacemark] = {
    if (body == null || body.trim.isEmpty) return Seq.empty

    val root: Elem = XML.loadString(body)
    // Accept either <kml><Document>…</kml> or a bare <Document> root;
    // the reference requires kml.Document to exist (task.ts:98).
    val doc: Node =
      if (root.label == "kml") {
        (root \ "Document").headOption.getOrElse(throw new KmlDocumentNotFound)
      } else if (root.label == "Document") root
      else throw new KmlDocumentNotFound

    val folder = (doc \ "Folder").headOption match {
      case None    => return Seq.empty // task.ts:99 — silent empty
      case Some(f) => f
    }

    (folder \ "Placemark").map { pm =>
      val point = (pm \ "Point").headOption
      val coords = point.flatMap(p => (p \ "coordinates").headOption).map(_.text)
      val when = (pm \ "TimeStamp").headOption
        .flatMap(ts => (ts \ "when").headOption).map(_.text)
      // ExtendedData pivot: list of <Data name=k><value>v</value></Data>
      // → string map (task.ts:109-112). Missing <value> → empty string
      // (xml2js yields '' for an empty element).
      val extended: Map[String, String] = (pm \ "ExtendedData").headOption match {
        case None => Map.empty
        case Some(ed) =>
          (ed \ "Data").flatMap { d =>
            d.attribute("name").map(_.text).map { k =>
              k -> (d \ "value").headOption.map(_.text).getOrElse("")
            }
          }.toMap
      }
      RawPlacemark(
        shareId = shareId,
        callSign = callSign,
        coordinatesRaw = if (point.isDefined) coords.orElse(Some("")) else None,
        whenRaw = when,
        extended = extended)
    }
  }
}
