package graft

import graft.jobs.{BatchJob, JobManager, JobResult, JobStatus}

class JobManagerSpec extends SparkSpec {

  test("lifecycle: queued -> processing -> completed with timestamps") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 10)
    assert(jm.get(id).get.status == JobStatus.Queued)
    jm.updateStatus(id, JobStatus.Processing)
    assert(jm.get(id).get.started_at.isDefined)
    jm.updateStatus(id, JobStatus.Completed)
    val j = jm.get(id).get
    assert(j.status == JobStatus.Completed && j.completed_at.isDefined)
  }

  test("progress percentage = processed/total*100") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 4)
    jm.updateProgress(id, 1, 4)
    assert(math.abs(jm.get(id).get.progress_percentage - 25.0) < 1e-9)
    jm.updateProgress(id, 4, 4)
    assert(math.abs(jm.get(id).get.progress_percentage - 100.0) < 1e-9)
  }

  test("success/failure tallies move with per-doc results") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 3)
    jm.addResult(id, JobResult(Some("d1"), 0, JobStatus.Completed, 2))
    jm.addResult(id, JobResult(Some("d2"), 1, JobStatus.Failed,
      error = Some("boom")))
    jm.addResult(id, JobResult(Some("d3"), 2, JobStatus.Completed, 1))
    val j = jm.get(id).get
    assert(j.successful_documents == 2 && j.failed_documents == 1)
  }

  test("cancel: only non-terminal jobs; terminal cancel returns false") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 1)
    assert(jm.cancel(id))
    assert(jm.get(id).get.status == JobStatus.Cancelled)
    assert(!jm.cancel(id)) // already terminal
  }

  test("submit runs work on a pool thread and completes the job") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 1)
    val latch = new java.util.concurrent.CountDownLatch(1)
    jm.submit(id, { s =>
      s.range(100).count() // a real Spark action under the job group
      latch.countDown()
    })
    assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // completion status is set after work returns
    var tries = 0
    while (jm.get(id).get.status != JobStatus.Completed && tries < 100) {
      Thread.sleep(50); tries += 1
    }
    assert(jm.get(id).get.status == JobStatus.Completed)
  }

  test("submitWithProgress: intermediate task progress is published, then 100%") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 1)
    @volatile var midProgress = -1.0
    jm.submitWithProgress(id, { s =>
      s.range(0, 1000, 1, 8).count()
      // the Spark job above is done; its task-end events land on the
      // async listener bus — wait (bounded) until progress is published
      var waited = 0
      while (jm.get(id).get.progress_percentage <= 0 && waited < 400) {
        Thread.sleep(25); waited += 1
      }
      midProgress = jm.get(id).get.progress_percentage
      ()
    })
    var tries = 0
    while (jm.get(id).get.status != JobStatus.Completed && tries < 400) {
      Thread.sleep(25); tries += 1
    }
    val j = jm.get(id).get
    assert(j.status == JobStatus.Completed)
    assert(math.abs(j.progress_percentage - 100.0) < 1e-9)
    // the listener published real task progress before completion forced 100
    assert(midProgress > 0.0, s"no intermediate progress seen: $midProgress")
    // document counters are not clobbered by task counts
    assert(j.total_documents == 1)
  }

  test("failed work marks the job failed with the error message") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("col1", 1)
    jm.submit(id, _ => throw new RuntimeException("exploded"))
    var tries = 0
    while (jm.get(id).get.status != JobStatus.Failed && tries < 100) {
      Thread.sleep(50); tries += 1
    }
    val j = jm.get(id).get
    assert(j.status == JobStatus.Failed)
    assert(j.error_message.contains("exploded"))
  }

  test("ledger queries: newest-first listing, status filter, invalid filter empty") {
    val jm = new JobManager(spark)
    val ids = (1 to 5).map { i =>
      val id = jm.createBatchJob(s"col$i", i); Thread.sleep(5); id
    }
    jm.updateStatus(ids(0), JobStatus.Completed)
    jm.updateStatus(ids(1), JobStatus.Failed)
    val listed = jm.listJobs(3).collect()
    assert(listed.length == 3)
    val times = listed.map(_.getAs[java.sql.Timestamp]("created_at").getTime)
    assert(times.sameElements(times.sortBy(-(_: Long)))) // newest first
    assert(jm.listJobs(10, Some(JobStatus.Completed)).count() == 1)
    assert(jm.listJobs(10, Some("nonsense")).count() == 0) // reference :126-128
  }

  test("counts by status include all five statuses with zeros") {
    val jm = new JobManager(spark)
    jm.createBatchJob("c", 1)
    val counts = jm.countsByStatus.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == JobStatus.All.toSet)
    assert(counts(JobStatus.Queued) == 1)
    assert(counts(JobStatus.Failed) == 0)
  }

  test("cleanup removes only old terminal jobs") {
    val jm = new JobManager(spark)
    val id = jm.createBatchJob("c", 1)
    jm.updateStatus(id, JobStatus.Completed)
    assert(jm.cleanupOldJobs(24) == 0) // not old enough
    assert(jm.cleanupOldJobs(0) == 1)  // cutoff now -> removed
    assert(jm.get(id).isEmpty)
  }
}
