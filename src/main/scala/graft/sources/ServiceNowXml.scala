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

  /** S7 oracled round-trip: a deterministic incident-XML fixture derived
    * from the documents table (en docs, doc_id < 40), written once to a
    * per-corpus temp dir, then parsed back through the secured SAX
    * source above. The oracle recomputes every field and the
    * searchable_text assembly (ingest_servicenow.py:59-80) directly
    * from documents — so the XML write → SAX parse → display_value
    * precedence → labeled "\n\n" concat path is hash-gated end-to-end.
    * Exercised rules: display_value wins over element text (priority),
    * absent elements drop out of searchable_text (close_notes on odd
    * ids; subcategory/work_notes/... never emitted), element text is
    * entity-escaped on write and trimmed on parse.
    */
  /** Per-JVM fixture locations: a fresh temp dir per corpus per
    * process. Reusing a durable /tmp path across JVMs would make a
    * partially-written fixture (killed JVM) or a stale one (corpus
    * regenerated at the same path) permanent; a session-scoped dir —
    * like the session-catalog index tables — cannot outlive the code
    * and data that wrote it. */
  private val fixtureDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  def roundTripFixture(spark: SparkSession, dir: String): DataFrame = {
    val outPath = fixtureDirs.computeIfAbsent(dir, { _ =>
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_snxml_").toFile
      val rows = graft.Tables.documents(spark, dir)
        .filter(col("lang") === lit("en") && col("doc_id") < 40)
        .select("doc_id", "text", "source", "lang").collect()
      rows.foreach { r =>
        val id = r.getLong(0)
        val esc = (s: String) => scala.xml.Utility.escape(s)
        val desc = esc(r.getString(1).substring(
          0, math.min(80, r.getString(1).length)))
        val closeNotes =
          if (id % 2 == 0) s"<close_notes>resolved batch ${id % 10}</close_notes>"
          else ""
        val xml =
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<response><result><incident>
             |<number>INC${"%07d".format(id)}</number>
             |<short_description>${esc(r.getString(2))}</short_description>
             |<description>$desc</description>
             |<category>${esc(r.getString(3))}</category>
             |<priority display_value="P${id % 4 + 1}">${id % 4 + 1}</priority>
             |$closeNotes
             |<active>true</active>
             |</incident></result></response>""".stripMargin
        java.nio.file.Files.writeString(
          new java.io.File(outDir, s"incident_${"%05d".format(id)}.xml")
            .toPath, xml)
      }
      outDir.getPath
    })
    read(spark, outPath)
      .select("source_file", "number", "short_description", "description",
        "category", "priority", "close_notes", "active", "searchable_text")
  }

  val roundTripOracleSql: String =
    """WITH src AS (
      |  SELECT doc_id,
      |    'incident_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.xml'
      |      AS source_file,
      |    'INC' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS number,
      |    source AS short_description,
      |    trim(substr(text, 1, 80)) AS description,
      |    lang AS category,
      |    'P' || CAST(doc_id % 4 + 1 AS VARCHAR) AS priority,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN 'resolved batch ' || CAST(doc_id % 10 AS VARCHAR) END
      |      AS close_notes,
      |    'true' AS active
      |  FROM documents WHERE lang = 'en' AND doc_id < 40
      |)
      |SELECT source_file, number, short_description, description,
      |  category, priority, close_notes, active,
      |  'Incident: ' || number
      |    || chr(10) || chr(10) || 'Summary: ' || short_description
      |    || chr(10) || chr(10) || 'Description: ' || description
      |    || chr(10) || chr(10) || 'Category: ' || category
      |    || coalesce(chr(10) || chr(10) || 'Resolution: ' || close_notes,
      |                '')
      |    AS searchable_text
      |FROM src ORDER BY source_file ASC""".stripMargin
}
