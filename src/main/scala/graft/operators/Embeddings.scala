package graft.operators

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel, HashingTF, IDF, Normalizer, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.functions.vector_to_array
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

  /** Fit-once model cache, keyed by (dir, dim): the TF-IDF pipeline and
    * the LSH model are INDEX ARTIFACTS — fitting them is the index
    * build, and re-fitting per search (the round-2/3 shape) is a
    * full-corpus pass per query. One fit per corpus per session; at
    * cluster scale these would be `model.save`d next to the index
    * table. */
  private val models = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), (PipelineModel, BucketedRandomProjectionLSHModel)]

  /** Deterministic catalog name for the persisted hashed-embedding
    * index of (dir, dim). */
  def embIndexName(dir: String, dim: Int): String =
    s"graft_emb_${ScaleOps.contentHash(dir, "documents")}_d$dim"

  /** Build-once / probe-many: fit the TF-IDF pipeline and LSH model
    * once per (dir, dim), persist (doc_id, embedding, hashes) to the
    * session catalog, and return (models, hashed index frame).
    * `approxNearestNeighbors` sees the precomputed `hashes` column and
    * skips re-hashing the corpus, so a search touches only the stored
    * index — the ivfflat build/probe split (init-db.sql:32) for the
    * MLlib path. */
  def ensureEmbIndex(spark: SparkSession, dir: String,
      dim: Int = DefaultDim):
      ((PipelineModel, BucketedRandomProjectionLSHModel), DataFrame) = {
    val fitted = models.computeIfAbsent((dir, dim), { _ =>
      val docs = Tables.documents(spark, dir)
      val pm = pipeline(dim).fit(docs)
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("embedding").setOutputCol("hashes")
        .setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
      val emb = pm.transform(docs).select("doc_id", "embedding")
      (pm, lsh.fit(emb))
    })
    val name = embIndexName(dir, dim)
    if (!spark.catalog.tableExists(name)) {
      val docs = Tables.documents(spark, dir)
      val emb = fitted._1.transform(docs).select("doc_id", "embedding")
      ScaleOps.writeBucketed(fitted._2.transform(emb), name, "doc_id", 8)
    }
    (fitted, spark.table(name))
  }

  /** LSH index + ANN query: top-k nearest neighbors of the document
    * `queryDocId` among all other documents, by cosine distance over the
    * TF-IDF embeddings (candidates from the persisted LSH index, exact
    * re-rank via codegen'd array arithmetic — no UDF). */
  def annSearch(spark: SparkSession, dir: String, queryDocId: Long,
      k: Int, dim: Int = DefaultDim): DataFrame = {
    val ((_, lshModel), hashed) = ensureEmbIndex(spark, dir, dim)
    // one-row point lookup of the query vector (inherent to point-query
    // ANN); only the query vector is hashed at search time
    val queryVec = hashed.filter(col("doc_id") === queryDocId)
      .head().getAs[org.apache.spark.ml.linalg.Vector]("embedding")
    // L2-normalized vectors: euclidean² = 2·(1−cos) → same ordering;
    // ask for extra candidates then exact re-rank
    val candidates = lshModel.approxNearestNeighbors(
      hashed.filter(col("doc_id") =!= queryDocId),
      queryVec, math.max(k * 4, 20)).toDF()
    val qArr = typedLit(queryVec.toArray.toSeq)
    candidates
      .select(col("doc_id"),
        round(lit(1.0) - Similarity.dot(
          vector_to_array(col("embedding")), qArr), 6).as("dist"))
      .orderBy(col("dist").asc, col("doc_id").asc)
      .limit(k)
  }

  /** Exact cosine top-k over the generated embeddings (ground truth for
    * the ANN recall check). */
  def exactSearch(spark: SparkSession, dir: String, queryDocId: Long,
      k: Int, dim: Int = DefaultDim): DataFrame = {
    val (_, hashed) = ensureEmbIndex(spark, dir, dim)
    val queryVec = hashed.filter(col("doc_id") === queryDocId)
      .head().getAs[org.apache.spark.ml.linalg.Vector]("embedding")
    val qArr = typedLit(queryVec.toArray.toSeq)
    hashed.filter(col("doc_id") =!= queryDocId)
      .select(col("doc_id"),
        round(lit(1.0) - Similarity.dot(
          vector_to_array(col("embedding")), qArr), 6).as("dist"))
      .orderBy(col("dist").asc, col("doc_id").asc)
      .limit(k)
  }
}
