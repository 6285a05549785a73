package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
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
}
