package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Mutation utilities over immutable parquet directories (SURVEY.md §7
  * hard-part 5): the reference's row-level DELETE/UPDATE (Postgres heap,
  * /root/reference/src/core/vector_store.py:360-392) become anti-join
  * rewrites committed by an atomic directory swap — a rewrite utility,
  * deliberately NOT a fake transaction log (production would use
  * Delta/Iceberg; the swap keeps readers consistent on a filesystem with
  * atomic rename).
  */
object ParquetStore {

  /** Overwrite `dir` with `df` via a sibling-tmp-dir swap: write to tmp,
    * rename target away, rename tmp into place, drop the old data only
    * after the swap succeeds (rolled back if the second rename fails).
    * Each rename is atomic but the PAIR is not: a reader between the two
    * renames sees no directory, and a crash in that window leaves the
    * data under the `.old-` path (recoverable by hand, never lost).
    * Production would use a table format (Delta/Iceberg) whose commit
    * protocol closes that window; this utility deliberately stays a
    * plain-filesystem rewrite, not a fake transaction log. */
  def overwriteAtomic(df: DataFrame, dir: String): Unit = {
    val target = Paths.get(dir)
    val tmp = Paths.get(dir + ".tmp-" + System.nanoTime())
    val old = Paths.get(dir + ".old-" + System.nanoTime())
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val existed = Files.exists(target)
    if (existed) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Exception =>
        if (existed) Files.move(old, target, StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    if (existed) deleteRecursively(old)
  }

  /** S5: delete rows matching the keys (anti-join rewrite). Returns the
    * number of rows removed (the reference reports deleted counts,
    * vector_store.py:389). */
  def deleteWhere(spark: SparkSession, dir: String, keys: DataFrame,
      keyCols: Seq[String]): Long = {
    val current = spark.read.parquet(dir)
    val before = current.count()
    val survivors = current.join(keys, keyCols, "left_anti")
    // materialize the survivor set before the swap invalidates its input
    val rows = survivors.cache()
    val after = rows.count()
    overwriteAtomic(rows, dir)
    rows.unpersist()
    before - after
  }

  /** P8: append rows whose key is absent (collection auto-create /
    * upsert-if-missing, /root/reference/src/api/documents.py:111-126). */
  def appendIfAbsent(spark: SparkSession, dir: String, rows: DataFrame,
      keyCols: Seq[String]): Long = {
    if (!Files.exists(Paths.get(dir))) {
      // atomic create: a direct write.parquet(dir) makes the directory
      // visible before the job finishes, so a killed run would leave a
      // partial store that every later exists-check happily serves
      // (r16 ADVICE) — route the create through the tmp+rename swap
      overwriteAtomic(rows, dir)
      spark.read.parquet(dir).count()
    } else {
      val current = spark.read.parquet(dir)
      val fresh = rows.join(current.select(keyCols.map(
        org.apache.spark.sql.functions.col): _*).distinct(),
        keyCols, "left_anti").cache()
      val n = fresh.count()
      if (n > 0) {
        val merged = current.unionByName(fresh).cache()
        merged.count()
        overwriteAtomic(merged, dir)
        merged.unpersist()
      }
      fresh.unpersist()
      n
    }
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })
    }
}
