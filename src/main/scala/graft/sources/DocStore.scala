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
    RetentionSwap.recover(spark, table, "bucket", discardIntentless = false)
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

  /** Parquet stand-in for `DELETE FROM results WHERE predicate`, via the
    * shared [[RetentionSwap]] staged partition-swap (one implementation of
    * the swap protocol + crash recovery for both result stores — see its
    * scaladoc for the protocol, the `_affected` intent-file recovery
    * classes, and the single-maintenance-process concurrency contract).
    * Iceberg's snapshot commit removes the swap's crash window entirely
    * (single atomic metadata swap); this is exactly the class of gap the
    * `DocStore` seam isolates. Concurrent READERS are safe:
    * [[readResults]] only ever rolls a swap forward when the intent file
    * proves the live dirs need it AND the writer's lease is stale or
    * released — a fresh lease defers recovery to the live writer.
    */
  override def deleteWhere(spark: SparkSession, table: String, predicate: Column): Long =
    RetentionSwap.deleteWhere(spark, table, "bucket", predicate,
      () => readResults(spark, table))
}
