package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, IDF, Normalizer, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalyzer

/** V5: the embedding-generation analog (SURVEY.md §2.3).
  *
  * The reference generates embeddings with sentence-transformers or a
  * remote API (/root/reference/src/core/embedding_client.py:59-124) and
  * indexes them with pgvector ivfflat (scripts/init-db.sql:32). The
  * Spark-native analog is an MLlib batch pipeline:
  *
  *   RegexTokenizer → StopWordsRemover (same stopword list as
  *   TextAnalyzer) → HashingTF(dim) → IDF → Normalizer(L2)
  *
  * producing fixed-dimension L2-normalized sparse vectors — deterministic,
  * offline, dimension-configurable (the reference's 384/768/1024 knob,
  * src/config/settings.py:37). The ANN index analog is
  * BucketedRandomProjectionLSH (fixed seed): bulk index build =
  * model.transform (hash buckets persisted alongside), search =
  * approxNearestNeighbors → exact cosine re-rank of the candidate set,
  * mirroring ivfflat's probe-then-refine.
  *
  * At 100 TB: the pipeline is one map-side pass (no shuffle except IDF's
  * doc-frequency aggregate); LSH bucketing is the standard shuffle-light
  * candidate generation for the similarity self-join.
  */
object Embeddings {

  val DefaultDim = 256

  def pipeline(dim: Int = DefaultDim): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("raw_tokens")
      .setPattern("\\W+").setToLowercase(true)
      .setMinTokenLength(TextAnalyzer.MinTokenLen)
    val stop = new StopWordsRemover()
      .setInputCol("raw_tokens").setOutputCol("tokens")
      .setStopWords(TextAnalyzer.StopWords.toArray)
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(dim)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    val norm = new Normalizer()
      .setInputCol("tfidf").setOutputCol("embedding").setP(2.0)
    new Pipeline().setStages(Array(tok, stop, tf, idf, norm))
  }

  /** Batch embedding generation over the documents table: one vector per
    * doc (the embeddings side-table shape, FIXTURES.md). */
  def embedDocuments(spark: SparkSession, dir: String,
      dim: Int = DefaultDim): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val model = pipeline(dim).fit(docs)
    model.transform(docs).select("doc_id", "embedding")
  }

  /** LSH index + ANN query: top-k nearest neighbors of the document
    * `queryDocId` among all other documents, by cosine distance over the
    * TF-IDF embeddings (candidates from LSH, exact re-rank). */
  def annSearch(spark: SparkSession, dir: String, queryDocId: Long,
      k: Int, dim: Int = DefaultDim): DataFrame = {
    // cache: the embedding frame feeds the LSH fit, the query-vector
    // lookup, and the candidate transform. Deliberately not unpersisted:
    // the returned DataFrame is lazy and still references it; identical
    // re-invocations reuse the same cache entry (plan-equality lookup),
    // so repeated calls do not accumulate copies.
    val emb = embedDocuments(spark, dir, dim).cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("embedding").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(emb)
    val queryVec = emb.filter(col("doc_id") === queryDocId)
      .head().getAs[org.apache.spark.ml.linalg.Vector]("embedding")
    // L2-normalized vectors: euclidean² = 2·(1−cos) → same ordering;
    // ask for extra candidates then exact re-rank
    val candidates = model.approxNearestNeighbors(
      model.transform(emb.filter(col("doc_id") =!= queryDocId)),
      queryVec, math.max(k * 4, 20)).toDF()
    val cosDist = udf { (v: org.apache.spark.ml.linalg.Vector) =>
      val dot = v.toArray.zip(queryVec.toArray).map { case (a, b) => a * b }.sum
      1.0 - dot // both L2-normalized
    }
    candidates
      .select(col("doc_id"), round(cosDist(col("embedding")), 6).as("dist"))
      .orderBy(col("dist").asc, col("doc_id").asc)
      .limit(k)
  }

  /** Exact cosine top-k over the generated embeddings (ground truth for
    * the ANN recall check). */
  def exactSearch(spark: SparkSession, dir: String, queryDocId: Long,
      k: Int, dim: Int = DefaultDim): DataFrame = {
    val emb = embedDocuments(spark, dir, dim)
    val queryVec = emb.filter(col("doc_id") === queryDocId)
      .head().getAs[org.apache.spark.ml.linalg.Vector]("embedding")
    val cosDist = udf { (v: org.apache.spark.ml.linalg.Vector) =>
      1.0 - v.toArray.zip(queryVec.toArray).map { case (a, b) => a * b }.sum
    }
    emb.filter(col("doc_id") =!= queryDocId)
      .select(col("doc_id"), round(cosDist(col("embedding")), 6).as("dist"))
      .orderBy(col("dist").asc, col("doc_id").asc)
      .limit(k)
  }
}
