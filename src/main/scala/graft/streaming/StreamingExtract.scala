package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.jobs.ExtractJob
import graft.model.InputDoc

/** Structured Streaming wrapper over the SAME batch parse core (SURVEY §2.8:
  * the reference has no streaming — this is the engine's incremental-ingest
  * surface, optional per north_rule but free because the per-row parse is
  * pure).
  *
  * `readStream` on the docs directory (new parquet files = new documents) →
  * typed mapPartitions parse → `foreachBatch` into the SAME bucketed results
  * layout the batch job writes, so downstream consumers and the analytics
  * queries cannot tell which path produced a row. Exactly-once: the
  * streaming checkpoint tracks consumed input files; the sink append is
  * idempotent per batch via epoch-tagged overwrite of the batch's bucket
  * output under results_stream/batch=<id>.
  */
object StreamingExtract {

  /** Start the incremental extraction stream.
    *
    * @param inDir   directory watched for new parquet doc files
    * @param outDir  output root (results_stream/ + checkpoint/)
    * @param trigger micro-batch trigger; Trigger.AvailableNow() drains the
    *                backlog then stops — the batch-parity mode used in tests
    */
  def start(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[InputDoc]].schema
    val stream: Dataset[InputDoc] = spark.readStream
      .schema(schema)
      .parquet(inDir)
      .as[InputDoc]

    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$outDir/checkpoint")
      .foreachBatch { (batch: Dataset[InputDoc], batchId: Long) =>
        val results = ExtractJob.extract(batch.sparkSession, batch,
          layout = ExtractJob.Layout.ByBucket)
        // overwrite of THIS batch's dir = idempotent replay on recovery
        results.write.mode("overwrite")
          .partitionBy("bucket")
          .parquet(s"$outDir/results_stream/batch=$batchId")
        ()
      }
      .start()
  }

  /** All rows extracted so far across micro-batches. */
  def readResults(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/results_stream")
}
