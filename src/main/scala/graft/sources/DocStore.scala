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

  override def writeBuckets(results: DataFrame, table: String): Unit = {
    val spark = results.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      results.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$table/results")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  override def readResults(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$table/results")

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

  override def writeUnitMetrics(metrics: DataFrame, table: String, unit: String): Unit = {
    val spark = metrics.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      metrics.write.mode(SaveMode.Overwrite)
        .partitionBy(unit)
        .parquet(s"$table/metrics")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Parquet stand-in for `DELETE FROM results WHERE predicate`: survivors
    * of the affected buckets are rewritten through a staging dir, then the
    * bucket partitions are swapped in (per-bucket rename — crash-consistent
    * per bucket; Iceberg's snapshot commit makes the whole delete atomic).
    * Writing to a staging path also sidesteps the overwrite-while-reading
    * restriction of path-based sources.
    */
  override def deleteWhere(spark: SparkSession, table: String, predicate: Column): Long = {
    import org.apache.spark.sql.functions.col
    val results = readResults(spark, table)
    val affected = results.filter(predicate)
      .groupBy(col("bucket")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (affected.isEmpty) return 0L
    val deleted = affected.values.sum
    val survivors = results
      .filter(col("bucket").isin(affected.keys.toSeq: _*) && !predicate)
    val f = fs(spark, table)
    val staging = new Path(s"$table/_retention_staging")
    f.delete(staging, true)
    survivors.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(staging.toString)
    val resultsDir = new Path(s"$table/results")
    affected.keys.foreach { b =>
      f.delete(new Path(resultsDir, s"bucket=$b"), true)
      val src = new Path(staging, s"bucket=$b")
      if (f.exists(src)) f.rename(src, new Path(resultsDir, s"bucket=$b"))
    }
    f.delete(staging, true)
    deleted
  }
}
