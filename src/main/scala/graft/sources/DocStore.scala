package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import graft.model.InputDoc

/** Storage seam for the extraction pipeline (SURVEY §7.1 step 6, §7.3 R7).
  *
  * The north rule targets Iceberg tables; this sandbox has no Iceberg
  * runtime jar, so the protocol is expressed against this trait:
  * [[ParquetDocStore]] implements it with bucket-partitioned parquet dirs +
  * a marker-file manifest (snapshot-equivalent: a bucket is visible iff its
  * marker exists, partial writes are invisible and rolled back on start).
  * An Iceberg implementation maps 1:1 — `readDocs` = `spark.read.table`,
  * `writeBuckets` = `replacePartitions` snapshot commit, the manifest =
  * the snapshot log itself, `rollback` = no-op (uncommitted snapshots
  * don't exist).
  */
trait DocStore {
  def readDocs(spark: SparkSession, table: String): Dataset[InputDoc]

  /** Atomically (re)place the given buckets of the results table. */
  def writeBuckets(results: DataFrame, table: String): Unit

  def readResults(spark: SparkSession, table: String): DataFrame

  /** Buckets whose writes are committed and visible. */
  def completedBuckets(spark: SparkSession, table: String): Set[Int]

  /** Mark buckets committed (the "snapshot commit"). */
  def commitBuckets(spark: SparkSession, table: String, buckets: Iterable[Int]): Unit

  /** Remove any uncommitted partial bucket output. */
  def rollbackUncommitted(spark: SparkSession, table: String): Unit

  def appendMetrics(metrics: DataFrame, table: String): Unit

  /** Idempotent metrics publish keyed on the resume unit (bucket/file_id):
    * partitioned by the unit column with dynamic overwrite, so a unit
    * replayed after a crash-between-metrics-and-markers REPLACES its
    * metrics rows instead of double-counting an append — lineage sums stay
    * exact across any number of restarts.
    */
  def writeUnitMetrics(metrics: DataFrame, table: String, unit: String): Unit

  /** Retention delete (P5, reference `storage.py:177-203` cleanup): remove
    * all result rows matching `predicate`, returning how many were removed.
    * Only buckets that contain matching rows are rewritten; the manifest is
    * untouched — a committed bucket stays committed (its content merely
    * shrinks, possibly to zero), so a subsequent resume run remains a no-op
    * and deleted documents are never resurrected. On Iceberg this is
    * `DELETE FROM results WHERE ...` — a copy-on-write snapshot commit.
    */
  def deleteWhere(spark: SparkSession, table: String, predicate: Column): Long
}

object DocStore {
  /** Run `body` with dynamic partition-overwrite mode set, restoring the
    * previous session setting afterwards — the one place this save/set/
    * restore dance lives (used by every idempotent partition publish).
    */
  def withDynamicOverwrite[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

/** Parquet stand-in: `table` is a directory root holding
  * `results/bucket=<b>/`, `_manifest/bucket_<b>.done`, `metrics/`.
  */
object ParquetDocStore extends DocStore {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(s"$root/_manifest")

  override def readDocs(spark: SparkSession, table: String): Dataset[InputDoc] = {
    import spark.implicits._
    spark.read.parquet(table).as[InputDoc]
  }

  override def writeBuckets(results: DataFrame, table: String): Unit =
    DocStore.withDynamicOverwrite(results.sparkSession) {
      results.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$table/results")
    }

  override def readResults(spark: SparkSession, table: String): DataFrame = {
    // Self-heal a crashed retention swap before ANY read or resume plans
    // against the results path — but ONLY the intent-present (mid-swap)
    // case, where the live dirs may already be half-swapped and recovery is
    // required for a consistent read. Staging WITHOUT an intent file means
    // no destructive step has run: the live table is fully consistent, so
    // the reader leaves the staging dir alone — discarding it here would
    // race a concurrently-running deleteWhere (staging written, intent not
    // yet) and delete the writer's only survivor copy mid-flight.
    // Discarding orphaned intent-less staging is the maintenance entry
    // point's job ([[deleteWhere]]), which assumes a single maintenance
    // process (see its scaladoc).
    recoverRetentionStaging(spark, table, discardIntentless = false)
    spark.read.parquet(s"$table/results")
  }

  override def completedBuckets(spark: SparkSession, table: String): Set[Int] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) Set.empty
    else
      f.listStatus(dir).iterator.map(_.getPath.getName).collect {
        case n if n.startsWith("bucket_") && n.endsWith(".done") =>
          n.stripPrefix("bucket_").stripSuffix(".done").toInt
      }.toSet
  }

  override def commitBuckets(
      spark: SparkSession, table: String, buckets: Iterable[Int]): Unit = {
    val f = fs(spark, table)
    f.mkdirs(manifestDir(table))
    buckets.foreach { b =>
      f.create(new Path(manifestDir(table), s"bucket_$b.done"), true).close()
    }
  }

  override def rollbackUncommitted(spark: SparkSession, table: String): Unit = {
    val done = completedBuckets(spark, table)
    val f = fs(spark, table)
    val resultsDir = new Path(s"$table/results")
    if (f.exists(resultsDir))
      f.listStatus(resultsDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("bucket=") &&
          !done.contains(n.stripPrefix("bucket=").toInt))
          f.delete(st.getPath, true)
      }
  }

  override def appendMetrics(metrics: DataFrame, table: String): Unit =
    metrics.write.mode(SaveMode.Append).parquet(s"$table/metrics")

  override def writeUnitMetrics(metrics: DataFrame, table: String, unit: String): Unit =
    DocStore.withDynamicOverwrite(metrics.sparkSession) {
      metrics.write.mode(SaveMode.Overwrite)
        .partitionBy(unit)
        .parquet(s"$table/metrics")
    }

  /** Parquet stand-in for `DELETE FROM results WHERE predicate`: survivors
    * of the affected buckets are rewritten through a staging dir, then the
    * bucket partitions are swapped in. SQL DELETE semantics: a row whose
    * predicate evaluates to NULL is KEPT (and not counted).
    *
    * Crash window (honest accounting): a kill between a bucket's delete and
    * its rename leaves that bucket's survivors only in `_retention_staging`.
    * [[recoverRetentionStaging]] runs first on every call and completes or
    * rolls back such an interrupted swap automatically (the `_affected`
    * intent file decides the direction), and every rename result is
    * checked so a failed swap aborts loudly with the staging copy preserved
    * rather than deleting the only copy. Iceberg's snapshot commit removes
    * this window entirely (single atomic metadata swap); this is exactly
    * the class of gap the `DocStore` seam isolates. Writing to a staging
    * path also sidesteps the overwrite-while-reading restriction of
    * path-based sources.
    *
    * Concurrency contract: at most ONE maintenance process (deleteWhere /
    * rollback) per table at a time — this call discards orphaned staging
    * from a previous crash, which would race a second concurrent
    * deleteWhere. Concurrent READERS are safe: readResults only ever rolls
    * a swap forward when the intent file proves the live dirs need it.
    */
  override def deleteWhere(spark: SparkSession, table: String, predicate: Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    recoverRetentionStaging(spark, table, discardIntentless = true)
    val hit = coalesce(predicate, lit(false)) // NULL predicate = keep (SQL DELETE)
    val results = readResults(spark, table)
    val affected = results.filter(hit)
      .groupBy(col("bucket")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (affected.isEmpty) return 0L
    val deleted = affected.values.sum
    val survivors = results
      .filter(col("bucket").isin(affected.keys.toSeq: _*) && !hit)
    val f = fs(spark, table)
    val staging = new Path(s"$table/_retention_staging")
    survivors.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(staging.toString)
    // The swap intent, recorded BEFORE the first destructive step. Each
    // line carries the bucket's recovery class, because the staging listing
    // alone cannot reconstruct it after a partial swap:
    //   d:<b> — fully deleted (no survivors; partitionBy wrote no staging
    //           dir): recovery must DELETE the live dir (a listing-driven
    //           recovery would resurrect exactly these buckets);
    //   s:<b> — has survivors in staging: recovery swaps them in — UNLESS
    //           the staging dir is already gone, which proves this bucket's
    //           swap completed and the live dir already IS the survivors
    //           (deleting it then would destroy their only copy).
    val staged = f.listStatus(staging).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("bucket=") =>
        n.stripPrefix("bucket=")
      }.toSet
    val intentBody = affected.keys.toSeq.sorted
      .map(b => (if (staged.contains(b.toString)) "s:" else "d:") + b)
      .mkString("\n")
    val intent = f.create(new Path(staging, "_affected"), true)
    try intent.write(intentBody.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally intent.close()
    val resultsDir = new Path(s"$table/results")
    affected.keys.foreach { b =>
      val dst = new Path(resultsDir, s"bucket=$b")
      if (!f.delete(dst, true) && f.exists(dst))
        throw new java.io.IOException(s"retention: could not remove $dst")
      val src = new Path(staging, s"bucket=$b")
      if (f.exists(src) && !f.rename(src, dst))
        throw new java.io.IOException(
          s"retention: rename $src -> $dst failed; survivors preserved in staging")
    }
    f.delete(staging, true) // only after every swap succeeded
    deleted
  }

  /** Automatic crash recovery for an interrupted [[deleteWhere]] swap. The
    * `_affected` intent file (written strictly after the survivor rewrite
    * commits and strictly before the first destructive step) decides the
    * direction:
    *
    *  - intent ABSENT → the swap never started and the results dirs were
    *    never touched: ROLL BACK by discarding the partial staging dir —
    *    but ONLY when `discardIntentless` (the maintenance entry points,
    *    which assume a single maintenance process). Readers pass `false`
    *    and leave intent-less staging untouched: the live table is
    *    consistent in that phase, and discarding would race an in-flight
    *    deleteWhere from another process (its staging deleted under it,
    *    then its swap silently skips the rename after deleting the live
    *    dir — the bucket's only copy gone);
    *  - intent PRESENT → the swap was mid-flight: ROLL FORWARD per bucket
    *    by its recorded class. `d:` buckets (fully deleted, never had a
    *    staging dir) get their live dir deleted — idempotent. `s:` buckets
    *    swap their staging survivors in — but ONLY while the staging dir
    *    still exists; its absence proves that bucket's swap already
    *    completed and the live dir IS the survivors, so it is left alone
    *    (re-deleting it would destroy the only copy — the intent classes
    *    exist precisely because "already swapped" and "fully deleted" are
    *    indistinguishable from the staging listing).
    *
    * Runs at the top of [[deleteWhere]] AND [[readResults]], so any reader
    * or resume run self-heals a crashed swap instead of serving the
    * half-swapped table until the next retention pass.
    */
  private def recoverRetentionStaging(
      spark: SparkSession, table: String, discardIntentless: Boolean): Unit = {
    val f = fs(spark, table)
    val staging = new Path(s"$table/_retention_staging")
    if (!f.exists(staging)) return
    val intentFile = new Path(staging, "_affected")
    if (!f.exists(intentFile) && !discardIntentless) return
    if (f.exists(intentFile)) {
      val in = f.open(intentFile)
      val entries =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      val resultsDir = new Path(s"$table/results")
      entries.foreach { e =>
        val (cls, b) = e.splitAt(2)
        val dst = new Path(resultsDir, s"bucket=$b")
        val src = new Path(staging, s"bucket=$b")
        cls match {
          case "d:" =>
            if (!f.delete(dst, true) && f.exists(dst))
              throw new java.io.IOException(
                s"retention recovery: could not remove $dst")
          case "s:" if f.exists(src) =>
            if (!f.delete(dst, true) && f.exists(dst))
              throw new java.io.IOException(
                s"retention recovery: could not remove $dst")
            if (!f.rename(src, dst))
              throw new java.io.IOException(
                s"retention recovery: rename $src -> $dst failed; " +
                  "survivors preserved in staging")
          case "s:" => () // swap already completed; dst holds the survivors
          case _ =>
            throw new java.io.IOException(
              s"retention recovery: unrecognized intent entry '$e'")
        }
      }
    }
    f.delete(staging, true)
  }
}
