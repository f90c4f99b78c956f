package graft

import org.apache.spark.sql.functions.col

import graft.operators.DocumentPipeline

class DocumentPipelineSpec extends SparkSpec {

  test("metadata validation: reserved keys, non-dict, fixed error order") {
    val rows = DocumentPipeline.validateWithMetadata(spark, Sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("error"))).toMap
    rows.foreach { case (id, err) =>
      if (id % 13 == 1) assert(err.isEmpty)           // no metadata → valid
      else if (id % 7 == 0)
        assert(err.contains("Metadata key 'chunk_index' is reserved"))
      else if (id % 7 == 2)                           // both present →
        assert(err.contains("Metadata key 'start_char' is reserved"))
      else if (id % 11 == 3)                          // reference order wins
        assert(err.contains("Metadata must be a dictionary"))
      else assert(err.isEmpty)
    }
  }
  import spark.implicits._

  private def metaOf(text: String): (String, Option[String]) = {
    val row = Seq((1L, text)).toDF("doc_id", "text")
      .select(
        DocumentPipeline.contentType(col("text")).as("ct"),
        DocumentPipeline.title(col("text")).as("title"))
      .head()
    (row.getString(0), Option(row.getString(1)))
  }

  test("validation: empty and oversize messages match the reference") {
    val errs = Seq("", "   ", "ok content", "x" * 5000001)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(DocumentPipeline.validationError(col("text")))
      .collect().map(r => Option(r.getString(0)))
    assert(errs(0).contains("Document content cannot be empty"))
    assert(errs(1).contains("Document content cannot be empty"))
    assert(errs(2).isEmpty)
    assert(errs(3).contains("Document content too large (max 5MB)"))
  }

  test("preprocess: all whitespace collapses to single spaces (reference quirk)") {
    val out = Seq(Tuple1("a\n\nb\t c   d  ")).toDF("text")
      .select(DocumentPipeline.preprocess(col("text"))).head().getString(0)
    assert(out == "a b c d") // newlines destroyed BEFORE line steps
  }

  test("content-type cascade: code beats markdown beats html beats text") {
    assert(metaOf("import os\n# heading")._1 == "code") // code wins
    assert(metaOf("# just a heading")._1 == "markdown")
    assert(metaOf("<div>plain</div>")._1 == "html")
    assert(metaOf("nothing special here")._1 == "text")
    assert(metaOf("SELECT stuff")._1 == "code") // case-sensitive indicator
    assert(metaOf("select stuff")._1 == "text") // lowercase not an indicator
    assert(metaOf("a * b")._1 == "markdown")    // bare asterisk quirk
  }

  test("title: markdown heading in first 5 lines wins") {
    assert(metaOf("intro\n# The Title\nbody")._2.contains("The Title"))
    assert(metaOf("## Sub Title\nbody")._2.contains("Sub Title"))
    // heading beyond line 5 is not considered; falls to first line
    val far = "l1\nl2\nl3\nl4\nl5\n# Late"
    assert(metaOf(far)._2.contains("l1"))
  }

  test("title: html <title> extraction") {
    assert(metaOf("<html><title>Page Name</title></html>")._2
      .contains("Page Name"))
  }

  test("title: short first line without trailing period") {
    assert(metaOf("Short Heading\nmore text")._2.contains("Short Heading"))
    assert(metaOf("This line ends with a period.\nmore")._2.isEmpty)
    assert(metaOf(("x" * 100) + "\nmore")._2.isEmpty) // >= 100 chars
  }

  test("title: found-but-empty <title> yields NO title (falsy quirk)") {
    // An empty <title> tag extracts '' -> falsy in Python (`if title:`)
    // -> no title, and NO fallback to the first-line heuristic
    assert(metaOf("<title>   </title>\nGood Line")._2.isEmpty)
    // A bare '# ' line can never match as markdown (strip() removes the
    // trailing space first) -> falls through to the first-line rule
    assert(metaOf("# \nGood Line")._2.contains("#"))
  }

  test("fixture table: stats align with the n_chars column") {
    val rows = graft.operators.DocumentPipeline
      .extractMetadata(spark, Sf0001)
      .join(Tables.documents(spark, Sf0001), "doc_id")
      .filter(col("content_length") =!= col("n_chars"))
    assert(rows.count() == 0)
  }
}
