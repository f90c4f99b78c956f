package graft

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {

  test("pipeline produces L2-normalized vectors of the configured dimension") {
    val emb = Embeddings.embedDocuments(spark, Sf0001, dim = 128)
    val vecs = emb.limit(20).collect().map(_.getAs[Vector]("embedding"))
    assert(vecs.nonEmpty)
    vecs.foreach { v =>
      assert(v.size == 128)
      val norm = math.sqrt(v.toArray.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-6 || norm == 0.0)
    }
  }

  test("embedding generation is deterministic") {
    val a = Embeddings.embedDocuments(spark, Sf0001, dim = 64)
      .orderBy("doc_id").limit(5).collect()
      .map(_.getAs[Vector]("embedding").toArray.toSeq)
    val b = Embeddings.embedDocuments(spark, Sf0001, dim = 64)
      .orderBy("doc_id").limit(5).collect()
      .map(_.getAs[Vector]("embedding").toArray.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("ANN candidates agree with exact top-k on the nearest neighbors") {
    val exact = Embeddings.exactSearch(spark, Sf0001, 0L, 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val ann = Embeddings.annSearch(spark, Sf0001, 0L, 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // LSH is approximate: require meaningful recall, not equality
    assert(ann.intersect(exact).size >= 5,
      s"recall too low: ${ann.intersect(exact).size}/10")
  }

  test("ANN distances are sorted and self is excluded") {
    val rows = Embeddings.annSearch(spark, Sf0001, 0L, 10).collect()
    assert(!rows.map(_.getAs[Long]("doc_id")).contains(0L))
    val dists = rows.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
  }
}
