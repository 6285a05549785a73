package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CanonicalSignature, InputDoc}
import graft.parse.SignatureTable
import graft.sources.{DocStore, ParquetDocStore}

/** Checkpoint/resume at partition (bucket) granularity — the
  * snapshot-equivalent manifest protocol of the north rule's
  * "Iceberg-snapshot-based checkpointing" (SURVEY §4.2, §7.3 R7), expressed
  * against the [[graft.sources.DocStore]] seam (parquet locally, Iceberg
  * drop-in on a real cluster):
  *
  *  - a bucket (= [[ExtractJob.bucketOf]], uniform hash of doc_id) is
  *    COMMITTED iff the store's manifest says so; markers are written only
  *    after the Spark write job commits, so a killed job leaves at worst
  *    partial bucket output with no marker;
  *  - rollback-on-start deletes uncommitted partials BEFORE any plan reads
  *    the results path (correctness independent of listing caches);
  *  - resume = anti-join against the committed bucket set, then a
  *    dynamic-partition-overwrite write of exactly the pending buckets.
  *
  * The parse core is a pure per-row function (no cross-row state —
  * SURVEY §3 E1), which is what makes bucket-granular replay sound: a
  * reprocessed doc yields byte-identical spans.
  */
object ResumableExtract {

  /** One (re)start of the job. Returns the number of docs processed by THIS
    * invocation (0 when everything was already committed).
    */
  def run(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      table: Seq[CanonicalSignature] = SignatureTable.Default,
      onlyBuckets: Option[Set[Int]] = None,
      store: DocStore = ParquetDocStore): Long = {
    val done = completedBuckets(spark, outPath, store)
    store.rollbackUncommitted(spark, outPath)
    val docs0: Dataset[InputDoc] = store.readDocs(spark, inPath)
    // Column-form resume filter: crc32 bucket derivation stays inside
    // WholeStageCodegen, so committed docs are skipped without
    // deserializing their span payloads into InputDoc objects (a typed
    // lambda here would decode the FULL corpus on every restart).
    val bc = ExtractJob.bucketCol
    val pending = onlyBuckets.foldLeft(
      if (done.isEmpty) docs0.toDF() else docs0.toDF().filter(!bc.isin(done.toSeq: _*))
    )((df, only) => df.filter(bc.isin(only.toSeq: _*)))
    import spark.implicits._
    val docs = pending.as[InputDoc]
    // this run covers EVERY pending bucket (the filter above scans them
    // all), so the commit set is the pending set — including buckets that
    // happen to contain zero docs. Committing only buckets observed in the
    // written rows would leave an empty bucket pending forever: every
    // restart re-scans the full input and the protocol never converges.
    val pendingBuckets = (0 until ExtractJob.NumBuckets)
      .filterNot(done)
      .filter(b => onlyBuckets.forall(_.contains(b)))
    if (docs.isEmpty) {
      store.commitBuckets(spark, outPath, pendingBuckets)
      return 0L
    }

    val (results, obs) = ExtractJob.observeCounts(
      ExtractJob.extract(spark, docs, table, ExtractJob.Layout.ByBucket).toDF())
    store.writeBuckets(results, outPath)
    val (okCount, errCount) = ExtractJob.okErr(obs)

    // Only now is the bucket durable — publish this run's lineage/metrics
    // idempotently per bucket (a crash between here and commitBuckets
    // replays the buckets on restart and OVERWRITES these rows — no
    // double count), then commit the markers. The read-back prunes to the
    // scalar metric columns; span payloads are never decoded again.
    val written = store.readResults(spark, outPath)
      .filter(!col("bucket").isin(done.toSeq: _*))
    store.writeUnitMetrics(
      ExtractJob.unitMetrics(written, "bucket"), outPath, "bucket")
    store.commitBuckets(spark, outPath, pendingBuckets)
    okCount + errCount
  }

  def completedBuckets(
      spark: SparkSession,
      out: String,
      store: DocStore = ParquetDocStore): Set[Int] =
    store.completedBuckets(spark, out)
}

/** spark-submit / runMain entry: ResumableMain <inDir> <outDir>. Safe to
  * re-invoke after a kill; completed buckets are never reprocessed.
  */
object ResumableMain {
  def main(args: Array[String]): Unit = {
    val (in, out) = JobSession.inOutArgs("ResumableMain", args)
    val spark = JobSession.build("graft-extract-resumable")
    val n = ResumableExtract.run(spark, in, out)
    println(s"processed $n docs this run; " +
      s"${ResumableExtract.completedBuckets(spark, out).size}/${ExtractJob.NumBuckets} buckets committed")
    spark.stop()
  }
}
