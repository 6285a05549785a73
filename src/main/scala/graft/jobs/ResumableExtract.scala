package graft.jobs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CanonicalSignature, InputDoc}
import graft.parse.SignatureTable

/** Checkpoint/resume at partition (bucket) granularity — the parquet
  * stand-in for the north rule's "Iceberg-snapshot-based checkpointing"
  * (SURVEY §4.2, §7.3 R7). On a real cluster the same protocol maps to
  * Iceberg `replacePartitions` snapshots; here it is:
  *
  *  - results live under `out/results/bucket=<b>/` (bucket =
  *    [[ExtractJob.bucketOf]], 64-way hash of doc_id);
  *  - a bucket is COMMITTED iff `out/_manifest/bucket_<b>.done` exists.
  *    Markers are written only after the Spark write job commits, so a
  *    killed job leaves at worst partial bucket dirs with no marker;
  *  - resume = left-anti against the committed bucket set, then a
  *    dynamic-partition-overwrite write, which atomically replaces any
  *    partial leftovers in the exact buckets being (re)processed and
  *    touches no committed bucket.
  *
  * The parse core is a pure per-row function (no cross-row state —
  * SURVEY §3 E1), which is what makes bucket-granular replay sound: a
  * reprocessed doc yields byte-identical spans.
  */
object ResumableExtract {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def manifestDir(out: String) = new Path(s"$out/_manifest")

  def completedBuckets(spark: SparkSession, out: String): Set[Int] = {
    val f = fs(spark, out)
    val dir = manifestDir(out)
    if (!f.exists(dir)) Set.empty
    else
      f.listStatus(dir).iterator.map(_.getPath.getName).collect {
        case n if n.startsWith("bucket_") && n.endsWith(".done") =>
          n.stripPrefix("bucket_").stripSuffix(".done").toInt
      }.toSet
  }

  def markCompleted(spark: SparkSession, out: String, buckets: Iterable[Int]): Unit = {
    val f = fs(spark, out)
    f.mkdirs(manifestDir(out))
    buckets.foreach { b =>
      f.create(new Path(manifestDir(out), s"bucket_$b.done"), true).close()
    }
  }

  /** Rollback-on-start: delete any bucket dir that has no manifest marker —
    * it is a partial leftover from a killed write (the Iceberg analog is
    * orphan-file cleanup / an uncommitted snapshot simply not existing).
    * Doing this FIRST, before any read plans against the results path, keeps
    * correctness independent of file-listing caches and committer internals.
    */
  def rollbackUncommitted(spark: SparkSession, outPath: String, done: Set[Int]): Unit = {
    val f = fs(spark, outPath)
    val resultsDir = new Path(s"$outPath/results")
    if (f.exists(resultsDir))
      f.listStatus(resultsDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("bucket=") &&
          !done.contains(n.stripPrefix("bucket=").toInt))
          f.delete(st.getPath, true)
      }
  }

  /** One (re)start of the job. Returns the number of docs processed by THIS
    * invocation (0 when everything was already committed).
    */
  def run(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      table: Seq[CanonicalSignature] = SignatureTable.Default,
      onlyBuckets: Option[Set[Int]] = None): Long = {
    val done = completedBuckets(spark, outPath)
    rollbackUncommitted(spark, outPath, done)
    val docs0: Dataset[InputDoc] = ExtractJob.readDocs(spark, inPath)
    val docs = docs0.filter { d =>
      val b = ExtractJob.bucketOf(d.doc_id)
      !done.contains(b) && onlyBuckets.forall(_.contains(b))
    }
    if (docs.isEmpty) return 0L

    val results = ExtractJob.extract(spark, docs, table, ExtractJob.Layout.ByBucket)

    // Dynamic partition overwrite: replaces exactly the bucket dirs present
    // in this run's output (including partial leftovers from a kill), never
    // the committed ones.
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      results.write.mode(SaveMode.Overwrite)
        .partitionBy("bucket")
        .parquet(s"$outPath/results")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // Only now is the bucket durable — commit the markers + this run's
    // lineage/metrics rows (appended: one batch per restart, keyed by run).
    val written = spark.read.parquet(s"$outPath/results")
      .filter(!col("bucket").isin(done.toSeq: _*))
    val processedBuckets = written.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    ExtractJob.partitionMetrics(written)
      .withColumn("run_buckets", lit(processedBuckets.size))
      .write.mode(SaveMode.Append).parquet(s"$outPath/metrics")
    markCompleted(spark, outPath, processedBuckets)
    written.count()
  }
}

/** spark-submit / runMain entry: ResumableMain <inDir> <outDir>. Safe to
  * re-invoke after a kill; completed buckets are never reprocessed.
  */
object ResumableMain {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract-resumable")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = ResumableExtract.run(spark, in, out)
    println(s"processed $n docs this run; " +
      s"${ResumableExtract.completedBuckets(spark, out).size}/${ExtractJob.NumBuckets} buckets committed")
    spark.stop()
  }
}
