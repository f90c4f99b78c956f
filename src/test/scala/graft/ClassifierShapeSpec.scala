package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalyzer
import graft.operators.Classifier

/** Pins the r18 nb_confusion strength reduction: the delta-decomposed
  * plan (prior + cnt·zero + Σ deltas, scan-local argmax) must be
  * BIT-IDENTICAL to the naive tokens × classes formulation it
  * replaced, and the plan must have lost the token-grain window. The
  * naive reference is inlined here verbatim (the pre-r18 shape) — the
  * DuckDB oracle still computes this same naive form, so the hash gate
  * cross-checks both engines while this spec cross-checks both PLANS
  * inside one engine. */
class ClassifierShapeSpec extends SparkSpec {

  /** The pre-r18 naive formulation: test tokens × classes, per-token
    * smoothed log term, window argmax. */
  private def naiveConfusion(dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % Classifier.Split =!= 0)
    val test = docs.filter(col("doc_id") % Classifier.Split === 0)
    def tok(d: DataFrame) = d.select(col("doc_id"), col("lang"),
      explode(TextAnalyzer.tokens(col("text"))).as("term"))
    val counts = tok(train).groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    val nTrain = train.select(count(lit(1)).as("n_train"))
    val cstat = counts.groupBy(col("lang").as("c_lang"))
      .agg(sum(col("n")).as("t_c"))
      .join(train.groupBy(col("lang").as("d_lang"))
          .agg(count(lit(1)).as("docs_c")),
        col("c_lang") === col("d_lang"))
      .crossJoin(nTrain)
      .select(col("c_lang"), col("t_c"),
        round(log(col("docs_c").cast("double") / col("n_train")) * 1e9)
          .cast("long").as("prior_nano"))
    val vocab = counts.select(countDistinct(col("term")).as("v"))
    val model = counts.select(col("lang").as("m_lang"),
      col("term").as("m_term"), col("n"))
    val scoredTerms = tok(test)
      .withColumnRenamed("lang", "true_lang")
      .crossJoin(broadcast(cstat))
      .crossJoin(broadcast(vocab))
      .join(broadcast(model),
        col("c_lang") === col("m_lang") && col("term") === col("m_term"),
        "left")
      .select(col("doc_id"), col("true_lang"), col("c_lang"),
        col("prior_nano"),
        round(log((coalesce(col("n"), lit(0L)) + 1).cast("double") /
          (col("t_c") + col("v"))) * 1e9).cast("long").as("term_nano"))
    val scores = scoredTerms
      .groupBy(col("doc_id"), col("true_lang"), col("c_lang"),
        col("prior_nano"))
      .agg(sum(col("term_nano")).as("sum_nano"))
      .select(col("doc_id"), col("true_lang"), col("c_lang"),
        (col("prior_nano") + col("sum_nano")).as("score_nano"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_nano").desc, col("c_lang").asc)
    scores
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("true_lang"), col("c_lang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("true_lang").asc, col("pred_lang").asc)
  }

  test("delta-decomposed confusion is bit-identical to the naive plan") {
    val fast = Classifier.nbConfusion(spark, Sf0001)
      .collect().map(_.toSeq.toList).toSeq
    val naive = naiveConfusion(Sf0001)
      .collect().map(_.toSeq.toList).toSeq
    assert(fast == naive && naive.nonEmpty,
      s"decomposed(${fast.size}) must equal naive(${naive.size})")
  }

  test("model-join size route: the shuffle route is bit-identical to " +
      "the broadcast route (r19 verdict #5)") {
    // default route at fixture scale: broadcast (count table « 64 MiB)
    val bcast = Classifier.nbConfusion(spark, Sf0001)
      .collect().map(_.toSeq.toList).toSeq
    // force the term-keyed shuffle route: threshold 0 AND the planner's
    // own auto-broadcast disabled, so the model join really shuffles
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("graft.nb.modelBroadcastMaxBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Classifier.nbConfusion(spark, Sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
        s"shuffle route not taken:\n$plan")
      val shuffled = df.collect().map(_.toSeq.toList).toSeq
      assert(shuffled == bcast && bcast.nonEmpty,
        "route changed the confusion matrix")
    } finally {
      spark.conf.unset("graft.nb.modelBroadcastMaxBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("the decomposed plan carries no window and no cross join") {
    val plan = Classifier.nbConfusion(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"token-grain window survived:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cross join survived:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
