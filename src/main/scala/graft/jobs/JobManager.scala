package graft.jobs

import java.time.Instant
import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B3/B4: the batch-job ledger, semantics ported from
  * /root/reference/src/core/job_manager.py (statuses :16-21, progress
  * :196-198, tallies :213-216, complete/fail :218-282, cancel :139-162,
  * cleanup :283-299, status counts :301-309).
  *
  * The reference keeps jobs in an in-process dict and runs work on the
  * asyncio loop. Spark-native translation:
  *   - ledger: an in-memory map exposed as a Dataset[BatchJob] so every
  *     ledger query (sort-desc-limit, status filter, tallies) is the same
  *     declarative DataFrame code at any ledger size
  *   - execution: jobs submit Spark actions on a pool thread under a
  *     named job group → cancel = SparkContext.cancelJobGroup (the
  *     task.cancel() analog, SURVEY §2.7 B4)
  */
object JobStatus {
  val Queued = "queued"
  val Processing = "processing"
  val Completed = "completed"
  val Failed = "failed"
  val Cancelled = "cancelled"
  val All: Seq[String] = Seq(Queued, Processing, Completed, Failed, Cancelled)
  val Terminal: Set[String] = Set(Completed, Failed, Cancelled)
}

case class JobResult(
    document_id: Option[String], document_index: Int, status: String,
    chunks_created: Int = 0, error: Option[String] = None,
    processing_time_ms: Long = 0L)

case class BatchJob(
    id: String, collection_name: String, status: String,
    created_at: java.sql.Timestamp,
    started_at: Option[java.sql.Timestamp] = None,
    completed_at: Option[java.sql.Timestamp] = None,
    total_documents: Int = 0, processed_documents: Int = 0,
    successful_documents: Int = 0, failed_documents: Int = 0,
    error_message: Option[String] = None,
    progress_percentage: Double = 0.0)

class JobManager(spark: SparkSession) {
  private val jobs = new ConcurrentHashMap[String, BatchJob]()
  private val results =
    new ConcurrentHashMap[String, ArrayBuffer[JobResult]]()
  private val pool = Executors.newFixedThreadPool(4)

  private def now() = java.sql.Timestamp.from(Instant.now())

  /** Atomic read-modify-write on the ledger entry (plain get+put would
    * lose concurrent tally/progress updates from pool threads). */
  private def update(jobId: String)(f: BatchJob => BatchJob): Unit = {
    jobs.computeIfPresent(jobId, (_, j) => f(j))
    ()
  }

  def createBatchJob(collectionName: String, totalDocuments: Int): String = {
    val id = UUID.randomUUID().toString
    jobs.put(id, BatchJob(id, collectionName, JobStatus.Queued, now(),
      total_documents = totalDocuments))
    results.put(id, ArrayBuffer.empty)
    id
  }

  def get(jobId: String): Option[BatchJob] = Option(jobs.get(jobId))

  /** Shared submission path: run `work` under a cancellable Spark job
    * group on a pool thread; mark Completed on clean return (unless a
    * concurrent cancel already made the job terminal), Failed on throw.
    */
  private def runInGroup(jobId: String, work: SparkSession => Unit,
      cleanup: () => Unit): Unit = {
    updateStatus(jobId, JobStatus.Processing)
    pool.submit(new Runnable {
      def run(): Unit = {
        val sc = spark.sparkContext
        sc.setJobGroup(jobId, s"batch job $jobId", interruptOnCancel = true)
        try {
          work(spark)
          update(jobId) { j =>
            if (j.status == JobStatus.Processing)
              j.copy(status = JobStatus.Completed,
                completed_at = Some(now()),
                processed_documents = j.total_documents,
                progress_percentage = 100.0)
            else j
          }
        } catch {
          case e: Exception => failJob(jobId, e.getMessage)
        } finally {
          sc.clearJobGroup()
          cleanup()
        }
      }
    })
    ()
  }

  def submit(jobId: String, work: SparkSession => Unit): Unit =
    runInGroup(jobId, work, () => ())

  /** Like submit, but live task-level progress flows into the ledger via
    * a SparkListener (the §2.7 B3 progress-accounting analog: the
    * reference updates per-document, we surface task completion as
    * progress_percentage). Attribution is exact: stages are mapped to
    * this job through the job-group property at job start, and only
    * tasks of those stages count — concurrent jobs in the same context
    * do not inflate each other. Only the PERCENTAGE is listener-driven;
    * the document-denominated counters (total/processed/succeeded/
    * failed) stay owned by the document pipeline via updateProgress/
    * addResult.
    */
  def submitWithProgress(jobId: String,
      work: SparkSession => Unit): Unit = {
    val sc = spark.sparkContext
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val done = new java.util.concurrent.atomic.AtomicInteger(0)
      private val total = new java.util.concurrent.atomic.AtomicInteger(0)
      private val myStages =
        java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null &&
          jobId == js.properties.getProperty("spark.jobGroup.id")) {
          js.stageInfos.foreach(si => myStages.add(si.stageId))
          total.addAndGet(js.stageInfos.map(_.numTasks).sum)
          ()
        }
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (myStages.contains(te.stageId)) {
          val d = done.incrementAndGet()
          val t = math.max(total.get(), 1)
          // percentage only; never past a terminal state (async events
          // can arrive after completion)
          update(jobId) { j =>
            if (JobStatus.Terminal.contains(j.status)) j
            else j.copy(progress_percentage =
              math.min(d, t).toDouble / t * 100)
          }
        }
      }
    }
    sc.addSparkListener(listener)
    runInGroup(jobId, work, () => sc.removeSparkListener(listener))
  }

  /** Cancel queued/processing jobs only (reference :146-148). */
  def cancel(jobId: String): Boolean = {
    var changed = false
    update(jobId) { j =>
      if (JobStatus.Terminal.contains(j.status)) j
      else {
        changed = true
        j.copy(status = JobStatus.Cancelled, completed_at = Some(now()))
      }
    }
    if (changed) spark.sparkContext.cancelJobGroup(jobId)
    changed
  }

  def updateStatus(jobId: String, status: String): Unit =
    update(jobId) { j =>
      val started =
        if (status == JobStatus.Processing && j.started_at.isEmpty)
          Some(now()) else j.started_at
      val completed =
        if (JobStatus.Terminal.contains(status)) Some(now())
        else j.completed_at
      j.copy(status = status, started_at = started,
        completed_at = completed)
    }

  /** progress% = processed/total*100 (reference :196-198). */
  def updateProgress(jobId: String, processed: Int, total: Int): Unit =
    update(jobId)(_.copy(
      processed_documents = processed, total_documents = total,
      progress_percentage =
        if (total > 0) processed.toDouble / total * 100 else 0.0))

  /** success/failure tallies move with each per-doc result (:213-216). */
  def addResult(jobId: String, r: JobResult): Unit = {
    Option(results.get(jobId)).foreach { buf =>
      buf.synchronized { buf += r }
    }
    update(jobId) { j =>
      r.status match {
        case JobStatus.Completed =>
          j.copy(successful_documents = j.successful_documents + 1)
        case JobStatus.Failed =>
          j.copy(failed_documents = j.failed_documents + 1)
        case _ => j
      }
    }
  }

  /** No-op on already-terminal jobs: a cancel interrupting the Spark
    * action makes the worker throw, and that failure must not overwrite
    * the Cancelled status (mirror of the success-path guard in submit). */
  def failJob(jobId: String, error: String): Unit =
    update(jobId) { j =>
      if (JobStatus.Terminal.contains(j.status)) j
      else j.copy(status = JobStatus.Failed,
        error_message = Some(error), completed_at = Some(now()))
    }

  /** Remove terminal jobs older than maxAgeHours (reference :283-299). */
  def cleanupOldJobs(maxAgeHours: Int = 24): Int = {
    val cutoff = Instant.now().minusSeconds(maxAgeHours * 3600L)
    val old = jobs.asScala.filter { case (_, j) =>
      j.created_at.toInstant.isBefore(cutoff) &&
        JobStatus.Terminal.contains(j.status)
    }.keys.toSeq
    old.foreach { id => jobs.remove(id); results.remove(id) }
    old.size
  }

  // ---- ledger as DataFrames (A3-A5, O1) --------------------------------

  def ledger: DataFrame = {
    import spark.implicits._
    jobs.values().asScala.toSeq.toDF()
  }

  /** O1: optional status filter, newest first, limit (reference :116-137). */
  def listJobs(limit: Int = 100, status: Option[String] = None): DataFrame = {
    val base = status match {
      case Some(s) if !JobStatus.All.contains(s) => ledger.limit(0)
      case Some(s) => ledger.filter(col("status") === s)
      case None => ledger
    }
    base.orderBy(col("created_at").desc, col("id").asc).limit(limit)
  }

  /** A3: counts by status, all five statuses present (reference :301-309). */
  def countsByStatus: DataFrame = {
    import spark.implicits._
    val all = JobStatus.All.toDF("status")
    all.join(ledger.groupBy("status").count(), Seq("status"), "left")
      .select(col("status"), coalesce(col("count"), lit(0L)).as("n"))
      .orderBy(col("status"))
  }
}
