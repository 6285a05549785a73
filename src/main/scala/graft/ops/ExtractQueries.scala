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

  /** docs with a deterministic invoice-field preamble prepended — built
    * from table columns so DuckDB can construct the IDENTICAL string and
    * independently regex-extract the same fields (oracle for the F8 rule
    * engine + F9 numeric coercion, SURVEY §2.3).
    */
  private def docsWithFields(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"),
        concat(
          lit("Invoice Number: INV-"), col("doc_id"), lit("\n"),
          lit("Total: $"), col("n_chars").cast("string"), lit(".50\n"),
          lit("Email: user"), col("doc_id"), lit("@example.com\n"),
          lit("Date: 12/15/2024\n"),
          lit("Phone: (555) 123-4567\n\n"), col("text")).as("text"))
      .as[(String, String)]
      .map { case (id, text) => InputDoc(id, Seq(Span("text", text, "", 0))) }
  }

  /** Oracle-checked rule extraction: the engine's kv spans vs DuckDB's
    * independent RE2 on the same constructed text. total_amount exercises
    * the Python-float-repr coercion path (1234.50 → "1234.5").
    */
  def ruleFields(spark: SparkSession, dir: String): DataFrame = {
    def kvVal(field: String) = coalesce(
      expr(s"substring(filter(spans, s -> s.kind = 'kv' AND " +
        s"startswith(s.text, '$field='))[0].text, ${field.length + 2})"),
      lit(""))
    ExtractJob.extract(spark, docsWithFields(spark, dir))
      .select(col("doc_id"),
        kvVal("invoice_number").as("invoice_number"),
        kvVal("total_amount").as("total_amount"),
        kvVal("date").as("date_value"),
        kvVal("email").as("email"),
        kvVal("phone_number").as("phone_number"))
      .orderBy("doc_id")
  }

  def ruleFieldsSql: String =
    """WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         'Invoice Number: INV-' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'Total: $' || CAST(n_chars AS VARCHAR) || '.50' || chr(10) ||
         'Email: user' || CAST(doc_id AS VARCHAR) || '@example.com' || chr(10) ||
         'Date: 12/15/2024' || chr(10) ||
         'Phone: (555) 123-4567' || chr(10) || chr(10) || text AS t
       FROM documents)
       SELECT doc_id,
         regexp_extract(t, '(?:invoice|inv|bill)\s*(?:number|#|no\.?)\s*:?\s*([A-Z0-9-]+)', 1, 'i') AS invoice_number,
         CAST(CAST(regexp_extract(t, '(?:total|amount|sum|due)\s*:?\s*\$?([0-9,]+\.?[0-9]*)', 1, 'i') AS DOUBLE) AS VARCHAR) AS total_amount,
         regexp_extract(t, '([0-9]{1,2}[/-][0-9]{1,2}[/-][0-9]{2,4})', 1, 'i') AS date_value,
         regexp_extract(t, '([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})', 1, 'i') AS email,
         regexp_extract(t, '(\(?[0-9]{3}\)?[-\.\s]?[0-9]{3}[-\.\s]?[0-9]{4})', 1, 'i') AS phone_number
       FROM t ORDER BY doc_id"""

  /** Rows-only: the full extraction surface on driver data. */
  def extractFull(spark: SparkSession, dir: String): DataFrame =
    ExtractJob.extract(spark, docsFromDocuments(spark, dir))
      .select(col("doc_id"), col("file_type"), col("signature_id"),
        col("sig_event"), col("n_kvs"), col("rule_coverage"),
        size(col("spans")).as("n_spans"))
      .orderBy("doc_id")

  /** A3 signature statistics (`signatures.py:341-354`): docs per canonical
    * signature family + classification by match event; avg docs/signature.
    * Rows-only (signature ids derive from the engine's own hash).
    */
  def signatureStats(spark: SparkSession, dir: String): DataFrame = {
    val e = ExtractJob.extract(spark, docsFromDocuments(spark, dir))
    e.groupBy(col("signature_id"), col("sig_event"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("sig_similarity")).as("avg_similarity"))
      .orderBy(desc("n_docs"), col("signature_id"))
  }

  /** A4 usage-tracker snapshot (`usage_tracker.py:25-141`) — the
    * deterministic analog: distributed metrics aggregation instead of a
    * lock-guarded global counter; model/DI calls are 0 by construction
    * (north rule), cost model constants × sums.
    */
  def usageSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val e = ExtractJob.extract(spark, docsFromDocuments(spark, dir))
    e.agg(
      count(lit(1)).as("documents_processed"),
      sum(col("n_kvs")).as("rule_hits"),
      sum(col("page_count")).as("pages"),
      avg(col("rule_coverage")).as("avg_rule_coverage"),
      lit(0L).as("llm_calls"),
      lit(0L).as("di_calls"),
      lit(0.0).as("total_cost_usd"))
  }

  /** Rows-only: exploded canonical span sequence. */
  def extractSpans(spark: SparkSession, dir: String): DataFrame =
    ExtractJob.extract(spark, docsFromDocuments(spark, dir))
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.order").as("ord"),
        col("span.kind").as("kind"), col("span.media_ref").as("media_ref"))
      .orderBy("doc_id", "ord")
}
