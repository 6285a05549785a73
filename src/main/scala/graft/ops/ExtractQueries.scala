package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{InputDoc, Span}
import graft.jobs.ExtractJob

/** Driver-contract queries that run the extraction core over a docs table
  * derived from the `documents` test table (one text span per row) — so the
  * engine's parse path is exercised on driver-provided data at any SF.
  */
object ExtractQueries {

  def docsFromDocuments(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      .as[(String, String)]
      .map { case (id, text) => InputDoc(id, Seq(Span("text", text, "", 0))) }
  }

  /** Oracle-checked: section/chunk counts from the engine vs DuckDB's
    * independent paragraph computation (C1/C4 semantics).
    */
  def chunkSectionCounts(spark: SparkSession, dir: String): DataFrame =
    ExtractJob.extract(spark, docsFromDocuments(spark, dir))
      .select(col("doc_id"), col("n_sections"), col("n_chunks"))
      .orderBy("doc_id")

  def chunkSectionCountsSql: String =
    """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(list_filter(string_split(text, chr(10)||chr(10)), x -> trim(x) != '')) AS INT) AS n_sections,
       CAST(len(list_filter(string_split(text, chr(10)||chr(10)), x -> trim(x) != '')) AS INT) AS n_chunks
       FROM documents ORDER BY doc_id"""

  /** Rows-only: the full extraction surface on driver data. */
  def extractFull(spark: SparkSession, dir: String): DataFrame =
    ExtractJob.extract(spark, docsFromDocuments(spark, dir))
      .select(col("doc_id"), col("file_type"), col("signature_id"),
        col("sig_event"), col("n_kvs"), col("rule_coverage"),
        size(col("spans")).as("n_spans"))
      .orderBy("doc_id")

  /** Rows-only: exploded canonical span sequence. */
  def extractSpans(spark: SparkSession, dir: String): DataFrame =
    ExtractJob.extract(spark, docsFromDocuments(spark, dir))
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.order").as("ord"),
        col("span.kind").as("kind"), col("span.media_ref").as("media_ref"))
      .orderBy("doc_id", "ord")
}
