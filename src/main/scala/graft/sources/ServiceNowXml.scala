package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7/S8: the ServiceNow incident XML source, semantics ported from
  * /root/reference/scripts/ingest_servicenow.py:26-87:
  *
  *  - one row per file matching `incident_*.xml` (glob discovery :160-161)
  *  - the first `<incident>` element anywhere in the document (`.//incident`)
  *  - 28 named fields; a field is present iff the element exists AND has
  *    non-empty text; `display_value` attribute wins over element text
  *    (:49-56)
  *  - `searchable_text` concatenates 9 labeled fields with "\n\n" (:59-80)
  *  - `source_file` = file basename (:81)
  *
  * Spark shape: whole-file text read (files are small; one row per file)
  * + a typed flatMap doing the XML parse per partition — parse failures
  * drop the row like the reference's try/except → None (:85-87).
  * At scale, millions of small XML files parallelize by file; the parse
  * is embarrassingly parallel.
  */
object ServiceNowXml {

  val Fields: Seq[String] = Seq(
    "number", "description", "short_description", "category",
    "subcategory", "priority", "impact", "urgency", "state",
    "assigned_to", "assignment_group", "caller_id", "close_notes",
    "resolution_notes", "work_notes", "comments", "knowledge",
    "u_affected_service", "u_root_cause", "u_business_impact",
    "opened_at", "closed_at", "resolved_at", "sys_created_on",
    "sys_updated_on", "active", "incident_state", "close_code")

  /** The 9 searchable parts in reference order: label -> field. */
  val SearchableParts: Seq[(String, String)] = Seq(
    "Incident" -> "number",
    "Summary" -> "short_description",
    "Description" -> "description",
    "Category" -> "category",
    "Subcategory" -> "subcategory",
    "Resolution" -> "close_notes",
    "Resolution Notes" -> "resolution_notes",
    "Work Notes" -> "work_notes",
    "Root Cause" -> "u_root_cause")

  /** Secure SAX parser: incident files are untrusted input, so disable
    * DTDs and external entities (XXE / billion-laughs). The reference's
    * ElementTree likewise does not resolve external entities. Parser
    * instances are not thread-safe — build per parse (cheap vs the file
    * IO; executors parse at most one file per task at a time anyway).
    */
  private def secureSaxParser(): javax.xml.parsers.SAXParser = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.newSAXParser()
  }

  /** Parse one XML document; None if no <incident> or malformed. */
  def parseIncident(xmlText: String): Option[Map[String, String]] =
    try {
      val root = scala.xml.XML.withSAXParser(secureSaxParser()).loadString(xmlText)
      val incidents =
        if (root.label == "incident") Seq(root) else (root \\ "incident")
      incidents.headOption.map { inc =>
        Fields.flatMap { f =>
          (inc \ f).headOption.flatMap { el =>
            val dv = el.attribute("display_value").map(_.text)
            val text = el.text
            if (text == null || text.isEmpty) None
            else Some(f -> dv.filter(_.nonEmpty).getOrElse(text.trim))
          }
        }.toMap
      }
    } catch { case _: Exception => None }

  def searchableText(data: Map[String, String]): String =
    SearchableParts.flatMap { case (label, field) =>
      data.get(field).filter(_.nonEmpty).map(v => s"$label: $v")
    }.mkString("\n\n")

  /** Read incident_*.xml under `dataPath` into a DataFrame with all 28
    * fields + searchable_text + source_file. */
  def read(spark: SparkSession, dataPath: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read
      .option("wholetext", "true")
      .text(s"$dataPath/incident_*.xml")
      .select(col("value"), input_file_name().as("path"))
      .as[(String, String)]
    val parsed = raw.flatMap { case (xml, path) =>
      parseIncident(xml).map { data =>
        val basename = path.substring(path.lastIndexOf('/') + 1)
        (Fields.map(f => data.getOrElse(f, null)), searchableText(data),
          basename)
      }
    }
    parsed.toDF("vals", "searchable_text", "source_file")
      .select(
        Fields.zipWithIndex.map { case (f, i) =>
          col("vals").getItem(i).as(f)
        } ++ Seq(col("searchable_text"), col("source_file")): _*)
      .orderBy(col("source_file"))
  }
}
