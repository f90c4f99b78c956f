package graft

import java.nio.file.Files

import graft.sources.ServiceNowXml

class ServiceNowXmlSpec extends SparkSpec {

  private val sampleXml =
    """<response>
      |  <result>
      |    <incident>
      |      <number>INC0010001</number>
      |      <short_description>X-Window display error</short_description>
      |      <description>User cannot open X-Window session  </description>
      |      <category>software</category>
      |      <subcategory></subcategory>
      |      <priority display_value="2 - High">2</priority>
      |      <close_notes>Restarted display manager</close_notes>
      |      <u_root_cause>Stale lock file</u_root_cause>
      |      <active>true</active>
      |    </incident>
      |  </result>
      |</response>""".stripMargin

  test("parse: fields extracted, display_value wins, empty elements dropped") {
    val data = ServiceNowXml.parseIncident(sampleXml).get
    assert(data("number") == "INC0010001")
    assert(data("priority") == "2 - High") // display_value over text
    assert(data("description") == "User cannot open X-Window session") // stripped
    assert(!data.contains("subcategory")) // empty element -> absent
    assert(!data.contains("assigned_to")) // missing element -> absent
  }

  test("searchable_text: labeled parts joined with blank lines, reference order") {
    val data = ServiceNowXml.parseIncident(sampleXml).get
    val st = ServiceNowXml.searchableText(data)
    val expected = Seq(
      "Incident: INC0010001",
      "Summary: X-Window display error",
      "Description: User cannot open X-Window session",
      "Category: software",
      "Resolution: Restarted display manager",
      "Root Cause: Stale lock file").mkString("\n\n")
    assert(st == expected)
  }

  test("malformed XML and incident-less documents are dropped") {
    assert(ServiceNowXml.parseIncident("<not closed").isEmpty)
    assert(ServiceNowXml.parseIncident("<response><result/></response>").isEmpty)
  }

  test("directory read: one row per incident_*.xml, non-matching files ignored") {
    val dir = Files.createTempDirectory("snow").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/incident_001.xml"), sampleXml)
    Files.writeString(java.nio.file.Paths.get(s"$dir/incident_002.xml"),
      sampleXml.replace("INC0010001", "INC0010002"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/other.xml"), sampleXml)
    val df = ServiceNowXml.read(spark, dir)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("number")).sorted.toSeq ==
      Seq("INC0010001", "INC0010002"))
    assert(rows.head.getAs[String]("searchable_text")
      .startsWith("Incident: INC"))
    assert(rows.map(_.getAs[String]("source_file")).sorted.toSeq ==
      Seq("incident_001.xml", "incident_002.xml"))
  }

  test("round-trip fixture: display_value precedence + assembly survive the wire") {
    val rows = ServiceNowXml.roundTripFixture(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[String]("number").stripPrefix("INC").toLong
      // display_value wins over element text
      assert(r.getAs[String]("priority") == s"P${id % 4 + 1}")
      // absent element → null column and no searchable part
      val st = r.getAs[String]("searchable_text")
      if (id % 2 == 0) {
        assert(r.getAs[String]("close_notes") == s"resolved batch ${id % 10}")
        assert(st.contains("\n\nResolution: resolved batch"))
      } else {
        assert(r.getAs[String]("close_notes") == null)
        assert(!st.contains("Resolution:"))
      }
      assert(st.startsWith(s"Incident: ${r.getAs[String]("number")}"))
    }
  }
}
