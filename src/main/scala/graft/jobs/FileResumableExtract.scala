package graft.jobs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.model.{CanonicalSignature, InputDoc}
import graft.parse.{DocParser, SignatureTable}
import org.apache.spark.TaskContext

/** Checkpoint/resume at INPUT-FILE granularity — the zero-shuffle
  * alternative to the bucket protocol ([[ResumableExtract]]).
  *
  * The bucket design pays a full-corpus hash shuffle before parsing so sink
  * files align with resume units. At 100 TB that shuffle moves every raw
  * byte once — the single most expensive avoidable operation in the job.
  * Tracking completed INPUT FILES instead (exactly how Structured
  * Streaming's file source checkpoints) removes it:
  *
  *  - the resume unit is one input parquet file; `file_id` =
  *    md5(file basename), a fixed-width safe partition value;
  *  - parse runs on the scan's own splits (ScanSplits — raw bytes never
  *    move); output is written `partitionBy("file_id")`, so each task
  *    writes only into its own file's partition dirs;
  *  - a file is COMMITTED iff `_manifest/file_<id>.done` exists; markers
  *    are written after the write job commits; rollback-on-start deletes
  *    uncommitted `file_id=` dirs;
  *  - resume lists input files, anti-joins the manifest, and scans ONLY
  *    the pending files — committed input is never re-read, let alone
  *    re-parsed (file-level pruning beats even partition pruning).
  *
  * Trade-off vs buckets: resume granularity follows input file sizing
  * (fine if the table is written with sane file sizes, as Iceberg enforces),
  * and the manifest grows with file count — at 10^12 docs that is an
  * Iceberg-metadata-scale problem, which Iceberg's snapshot log already
  * solves; the marker-file stand-in mirrors it locally.
  */
object FileResumableExtract {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(out: String) = new Path(s"$out/_manifest")

  def fileId(baseName: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(baseName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** `input_file_name()` returns the task's file as a URL-ENCODED URI
    * string; the driver-side manifest ids are computed from the RAW
    * basename (`Path.getName`). Both sides must hash the same string, or a
    * basename needing encoding (space, `%`, non-ASCII) would write output
    * under one id and its commit marker under another — rollback would
    * then delete committed output. `URI.getPath` percent-decodes without
    * `+`-to-space mangling (unlike URLDecoder), recovering the raw name.
    */
  def fileIdFromUri(fileUri: String): String =
    fileId(new Path(new java.net.URI(fileUri).getPath).getName)

  def inputFiles(spark: SparkSession, inPath: String): Seq[String] = {
    val dir = new Path(inPath)
    fs(spark, inPath).listStatus(dir).iterator
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .map(_.toString).toSeq.sorted
  }

  def completedFileIds(spark: SparkSession, out: String): Set[String] = {
    val f = fs(spark, out)
    val dir = manifestDir(out)
    if (!f.exists(dir)) Set.empty
    else
      f.listStatus(dir).iterator.map(_.getPath.getName).collect {
        case n if n.startsWith("file_") && n.endsWith(".done") =>
          n.stripPrefix("file_").stripSuffix(".done")
      }.toSet
  }

  def rollbackUncommitted(spark: SparkSession, out: String): Unit = {
    val done = completedFileIds(spark, out)
    val f = fs(spark, out)
    val resultsDir = new Path(s"$out/results")
    if (f.exists(resultsDir))
      f.listStatus(resultsDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("file_id=") && !done.contains(n.stripPrefix("file_id=")))
          f.delete(st.getPath, true)
      }
  }

  /** One (re)start. Returns docs processed by THIS invocation.
    * `timings`, when supplied, receives per-phase wall seconds
    * (rollback / write / metrics / commit) for scaling diagnosis.
    */
  def run(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      table: Seq[CanonicalSignature] = SignatureTable.Default,
      onlyFiles: Option[Set[String]] = None,
      timings: Option[scala.collection.mutable.Map[String, Double]] = None): Long = {
    import spark.implicits._
    def timed[A](phase: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      timings.foreach(m => m(phase) = m.getOrElse(phase, 0.0) +
        (System.nanoTime() - t0) / 1e9)
      r
    }
    val done = completedFileIds(spark, outPath)
    timed("rollback")(rollbackUncommitted(spark, outPath))
    val pending = inputFiles(spark, inPath)
      .filter { p =>
        val id = fileId(new Path(p).getName)
        !done.contains(id) && onlyFiles.forall(_.contains(id))
      }
    if (pending.isEmpty) return 0L

    // Scan ONLY the pending files; no shuffle anywhere in the job.
    val bc = spark.sparkContext.broadcast(table)
    val nb = ExtractJob.NumBuckets // driver-side capture (cluster-safe)
    val results0 = spark.read.parquet(pending: _*)
      .select(col("doc_id").as("_1"), col("spans").as("_2"),
        input_file_name().as("_3"))
      .as[(String, Seq[graft.model.Span], String)]
      .mapPartitions { iter =>
        val pool = DocParser.pooled(bc.value)
        val pid = TaskContext.getPartitionId()
        // one fileId hash per distinct URI. A memo map instead of a
        // last-entry cache: FileScanRDD happens to deliver rows clustered
        // by file today, but nothing downstream should depend on that
        // ordering — an interleaving source would silently mislabel rows
        // under a single-entry cache. Same amortized cost (one hash per
        // distinct file per task).
        val fidMemo = new scala.collection.mutable.HashMap[String, String]()
        iter.map { case (docId, spans, uri) =>
          val fid = fidMemo.getOrElseUpdate(uri, fileIdFromUri(uri))
          (ExtractJob.rowOf(InputDoc(docId, spans), pool, pid, nb), fid)
        }
      }
      .select(col("_1.*"), col("_2").as("file_id"))
    val (results, obs) = ExtractJob.observeCounts(results0)

    graft.sources.DocStore.withDynamicOverwrite(spark) {
      timed("write") {
        results.write.mode(SaveMode.Overwrite)
          .partitionBy("file_id")
          .parquet(s"$outPath/results")
      }
    }

    // Metrics per commit unit (file_id), published with dynamic partition
    // overwrite: a file replayed after a crash between this write and its
    // marker REPLACES its metrics rows — lineage sums never double-count.
    // The read-back prunes to scalar metric columns (no span decode).
    timed("metrics") {
      val written = spark.read.parquet(s"$outPath/results")
        .filter(!col("file_id").isin(done.toSeq: _*))
      graft.sources.DocStore.withDynamicOverwrite(spark) {
        ExtractJob.unitMetrics(written, "file_id")
          .write.mode(SaveMode.Overwrite).partitionBy("file_id")
          .parquet(s"$outPath/metrics")
      }
    }
    timed("commit") {
      val f = fs(spark, outPath)
      f.mkdirs(manifestDir(outPath))
      pending.foreach { p =>
        f.create(new Path(manifestDir(outPath),
          s"file_${fileId(new Path(p).getName)}.done"), true).close()
      }
    }
    val (ok, err) = ExtractJob.okErr(obs)
    ok + err
  }
}

/** spark-submit / runMain entry: FileResumableMain <inDir> <outDir>. The
  * zero-shuffle resumable job; safe to re-invoke after a kill.
  */
object FileResumableMain {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract-file-resumable")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = FileResumableExtract.run(spark, in, out)
    println(s"processed $n docs this run; " +
      s"${FileResumableExtract.completedFileIds(spark, out).size} input files committed")
    spark.stop()
  }
}
