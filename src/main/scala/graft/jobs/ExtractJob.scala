package graft.jobs

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CanonicalSignature, InputDoc, ParsedDoc}
import graft.parse.{DocParser, SignatureTable}

/** The distributed extraction job: docs table → canonical span table +
  * per-partition lineage/metrics (north rule).
  *
  * Scale design (SURVEY §4.2):
  *  - the parse core is a pure typed `mapPartitions` with per-partition
  *    pooled parser state (compiled regexes) — no cross-row state, so
  *    partition-granular resume is sound;
  *  - the signature/rule table is `broadcast` to executors (it is bounded by
  *    layout diversity, never by corpus size);
  *  - skew from giant multi-page PDFs is defused by round-robin
  *    repartitioning into `partitionsPerCore × cores` splits — a giant doc
  *    caps one task at one doc, it never drags a whole hash bucket with it;
  *  - per-doc rows carry (partition_id, bytes_in, parse_us); partition
  *    lineage rows are a partial-aggregated groupBy over them (no second
  *    pass over the text).
  */
object ExtractJob {

  /** Result row: the parsed doc plus lineage fields. */
  final case class ExtractedRow(
      doc_id: String,
      file_type: String,
      spans: Seq[graft.model.OutSpan],
      signature_id: String,
      sig_similarity: Double,
      sig_event: String,
      n_sections: Int,
      n_kvs: Int,
      n_chunks: Int,
      rule_coverage: Double,
      char_count: Long,
      page_count: Int,
      content_hash: String,
      error: String,
      bucket: Int,
      partition_id: Int,
      bytes_in: Long,
      parse_us: Long)

  val NumBuckets = 64 // resume granularity (manifest protocol, SURVEY §4.2)

  def bucketOf(docId: String): Int =
    java.lang.Math.floorMod(docId.hashCode, NumBuckets)

  def readDocs(spark: SparkSession, inPath: String): Dataset[InputDoc] = {
    import spark.implicits._
    spark.read.parquet(inPath).as[InputDoc]
  }

  /** Parse a docs Dataset into the extracted table. */
  def extract(
      spark: SparkSession,
      docs: Dataset[InputDoc],
      table: Seq[CanonicalSignature] = SignatureTable.Default,
      partitionsPerCore: Int = 4): Dataset[ExtractedRow] = {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val nPart = math.max(1, cores * partitionsPerCore)
    val bc = spark.sparkContext.broadcast(table)
    docs
      .repartition(nPart) // round-robin: even doc counts, no skew hot bucket
      .mapPartitions { iter =>
        val pool = DocParser.pooled(bc.value) // pooled per-partition state
        val pid = TaskContext.getPartitionId()
        iter.map { doc =>
          val bytesIn = {
            var b = 0L
            doc.spans.foreach(s => b += s.text.length + s.media_ref.length)
            b
          }
          val t0 = System.nanoTime()
          val p: ParsedDoc = DocParser.parse(doc, pool)
          val us = (System.nanoTime() - t0) / 1000
          ExtractedRow(p.docId, p.fileType, p.spans, p.signatureId,
            p.sigSimilarity, p.sigEvent, p.nSections, p.nKvs, p.nChunks,
            p.ruleCoverage, p.charCount, p.pageCount, p.contentHash, p.error,
            bucketOf(p.docId), pid, bytesIn, us)
        }
      }
  }

  /** Per-partition lineage/metrics rows (partial+final hash aggregate —
    * no extra pass over span text).
    */
  def partitionMetrics(results: DataFrame): DataFrame =
    results.groupBy(col("partition_id")).agg(
      count(lit(1)).as("docs_in"),
      sum(when(col("error") === "", 1L).otherwise(0L)).as("docs_ok"),
      sum(when(col("error") =!= "", 1L).otherwise(0L)).as("docs_err"),
      sum(size(col("spans"))).as("spans_out"),
      sum(col("bytes_in")).as("bytes_in"),
      sum(col("parse_us")).as("parse_us"))

  /** Full job: read → extract → write results (bucketed dirs for resume) +
    * metrics. Returns (docsOk, docsErr).
    */
  def run(spark: SparkSession, inPath: String, outPath: String): (Long, Long) = {
    val docs = readDocs(spark, inPath)
    val results = extract(spark, docs)
    results.write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(s"$outPath/results")
    val written = spark.read.parquet(s"$outPath/results")
    partitionMetrics(written).write.mode("overwrite")
      .parquet(s"$outPath/metrics")
    val counts = written.agg(
      sum(when(col("error") === "", 1L).otherwise(0L)),
      sum(when(col("error") =!= "", 1L).otherwise(0L))).head()
    (counts.getLong(0), if (counts.isNullAt(1)) 0L else counts.getLong(1))
  }
}

/** spark-submit / runMain entry: ExtractMain <inDir> <outDir>. */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (ok, err) = ExtractJob.run(spark, in, out)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"extracted ok=$ok err=$err in $sec%.1fs (${ok / sec}%.0f docs/sec)")
    spark.stop()
  }
}
