package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contentHash: stable for unchanged files, changes when a table " +
      "is regenerated in place, differs across dirs") {
    val h1 = ScaleOps.contentHash(Sf0001, "documents")
    assert(h1 == ScaleOps.contentHash(Sf0001, "documents"))
    assert(h1 != ScaleOps.contentHash(Sf0001, "embeddings"))
    // simulate an in-place fixture regeneration: same path, new bytes
    val d = java.nio.file.Files.createTempDirectory("graft_chash_")
    val f = d.resolve("documents.parquet")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
    val a = ScaleOps.contentHash(d.toString, "documents")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    val b = ScaleOps.contentHash(d.toString, "documents")
    assert(a != b,
      "regenerating a table in place must change the fingerprint")
    graft.sources.ParquetStore.deleteRecursively(d)
  }

  test("bucketed fact-fact join plans with NO shuffle exchange") {
    val orders = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, Sf0001)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    ScaleOps.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    ScaleOps.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    val joined = ScaleOps.bucketedJoin(spark, "b_orders", "b_lineitem",
      "o_orderkey")
    assert(!ScaleOps.hasShuffleExchange(joined),
      "bucketed join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString)
    // and it is still correct
    val expected = orders.join(lineitem, Seq("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("bucketed_revenue: whole join+agg plan has NO shuffle exchange " +
      "and matches the plain-join computation") {
    val df = ScaleOps.bucketedRevenue(spark, Sf0001, 10)
    assert(!ScaleOps.hasShuffleExchange(df),
      "bucketed revenue must not shuffle:\n" +
        df.queryExecution.executedPlan.toString)
    val got = df.collect().map(r =>
      (r.getAs[Long]("o_orderkey"), r.getAs[Double]("revenue"))).toSeq
    val expected = Tables.orders(spark, Sf0001)
      .join(Tables.lineitem(spark, Sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .collect().map(r =>
        (r.getAs[Long]("o_orderkey"), r.getAs[Double]("revenue"))).toSeq
    assert(got == expected)
  }

  test("unbucketed version of the same join DOES shuffle (control)") {
    val orders = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    // disable auto-broadcast so the control path is a genuine SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = orders.join(lineitem, Seq("o_orderkey"))
      assert(ScaleOps.hasShuffleExchange(joined))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition-by-collection layout prunes directories at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/docs"
    ScaleOps.writePartitioned(
      Tables.documents(spark, Sf0001), dir, "lang")
    val all = spark.read.parquet(dir)
    val pruned = all.filter(col("lang") === "fr")
    // the fr query must read strictly fewer files than the full scan
    val allFiles = ScaleOps.filesRead(all.select("doc_id"))
    val prunedFiles = ScaleOps.filesRead(pruned.select("doc_id"))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles")
    // and correctness is unchanged
    assert(pruned.count() ==
      Tables.documents(spark, Sf0001).filter(col("lang") === "fr").count())
  }

  test("salted aggregation equals the direct aggregation") {
    val direct = Tables.lineitem(spark, Sf0001)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("total"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val salted = ScaleOps.saltedCountSum(
      Tables.lineitem(spark, Sf0001), "l_suppkey", "l_quantity", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-6)
    }
  }

  test("zorderKey interleaves bits (known values) and stays within 2*bits bits") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 65535L)).toDF("x", "y")
    val out = df.select(ScaleOps.zorderKey(col("x"), col("y"), 16))
      .collect().map(_.getLong(0))
    // x bits land even, y bits odd: z(1,0)=1, z(0,1)=2, z(1,1)=3,
    // z(3,5)= x:011 y:101 -> 100111 = 39
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 39L, (1L << 32) - 1))
  }

  test("writeZOrdered yields disjoint per-file key ranges (file-pruning shape)") {
    val dir = java.nio.file.Files.createTempDirectory("zord").toString
    val keyed = ScaleOps.zorderEventKeys(spark, Sf0001, Int.MaxValue)
    ScaleOps.writeZOrdered(keyed, dir, "zkey", 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    val ranges = files.map { f =>
      val mm = spark.read.parquet(f)
        .agg(min(col("zkey")), max(col("zkey"))).head()
      (mm.getLong(0), mm.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"overlapping file ranges: $hi > $lo2")
      case _ =>
    }
  }

  test("attach: a fresh session registers an existing persisted table " +
      "instead of rebuilding — rows identical, bucket pruning intact, " +
      "and no marker / stale-layout marker refuses") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = "graft_attspec_src"
    val dup = "graft_attspec_dup"
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $dup")
    val df = (1L to 5000L).map(i => (i, s"v$i")).toDF("doc_id", "v")
    ScaleOps.writeBucketed(df, src, "doc_id", 8)
    // simulate a fresh JVM's view: the FILES exist (copy the committed
    // location, marker included) but the catalog has no entry
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val (s, d) = (Paths.get(wh, src), Paths.get(wh, dup))
    graft.sources.ParquetStore.deleteRecursively(d)
    Files.walk(s).forEach { p =>
      Files.copy(p, d.resolve(s.relativize(p).toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    assert(ScaleOps.attach(spark, dup -> ("doc_id", 8)))
    val a = spark.table(dup).orderBy("doc_id").collect()
    val b = spark.table(src).orderBy("doc_id").collect()
    assert(a.nonEmpty && (a sameElements b))
    // the registered bucket spec is live: an equality probe on the
    // bucket key statically prunes to 1 of 8 buckets
    val plan = spark.table(dup).filter(col("doc_id") === 4242L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
    // no marker (interrupted build / partially-deleted location) or a
    // marker from an older builder version => NOT attachable
    val dup2 = "graft_attspec_dup2"
    spark.sql(s"DROP TABLE IF EXISTS $dup2")
    val d2 = Paths.get(wh, dup2)
    graft.sources.ParquetStore.deleteRecursively(d2)
    Files.walk(d).forEach { p =>
      Files.copy(p, d2.resolve(d.relativize(p).toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    ScaleOps.unmarkAttachable(spark, dup2)
    assert(!ScaleOps.attach(spark, dup2 -> ("doc_id", 8)))
    Files.write(d2.resolve("_GRAFT_ATTACH"),
      "someFutureLayout".getBytes("UTF-8"))
    assert(!ScaleOps.attach(spark, dup2 -> ("doc_id", 8)))
    // attach group is all-or-nothing: one missing member fails the group
    assert(!ScaleOps.attach(spark,
      dup -> ("doc_id", 8), "graft_attspec_absent" -> ("doc_id", 8)))
    spark.sql(s"DROP TABLE IF EXISTS $src")
    spark.sql(s"DROP TABLE IF EXISTS $dup") // external: files survive
    graft.sources.ParquetStore.deleteRecursively(d)
    graft.sources.ParquetStore.deleteRecursively(d2)
  }

  test("build lock: a dead builder's lock is broken and the build " +
      "proceeds; a live builder's lock makes the waiter ATTACH the " +
      "committed generation instead of rewriting it") {
    import java.nio.file.{Files, Paths}
    val t = "graft_lockspec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    graft.sources.ParquetStore.deleteRecursively(Paths.get(wh, t))
    val lock = Paths.get(wh, s".graft_build_$t.lock")
    // (a) stale lock from a crashed builder (dead PID): broken, build
    // runs, lock released afterwards
    Files.createDirectories(lock.getParent)
    Files.write(lock, "999999999".getBytes("UTF-8"))
    val gen1 = (1L to 100L).map(i => (i, "gen1")).toDF("doc_id", "v")
    ScaleOps.writeBucketed(gen1, t, "doc_id", 4)
    assert(!Files.exists(lock), "lock not released after build")
    assert(spark.table(t).filter(col("v") === "gen1").count() == 100)
    // (b) live builder (this JVM's PID) holds the lock; it "commits"
    // (gen1 above is the committed, marked generation) and releases
    // 2 s later. The waiter must serve gen1 — NOT clobber it with its
    // own gen2 frame.
    Files.write(lock,
      ProcessHandle.current.pid.toString.getBytes("UTF-8"))
    val releaser = new Thread(() => {
      Thread.sleep(2000); Files.deleteIfExists(lock); ()
    })
    releaser.start()
    val gen2 = (1L to 100L).map(i => (i, "gen2")).toDF("doc_id", "v")
    ScaleOps.writeBucketed(gen2, t, "doc_id", 4) // blocks ~2 s, then attaches
    releaser.join()
    assert(spark.table(t).filter(col("v") === "gen1").count() == 100,
      "waiter clobbered the committed generation instead of attaching")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sources.ParquetStore.deleteRecursively(Paths.get(wh, t))
  }
}
