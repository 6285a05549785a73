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

  /** Opt-in shared materialization of the extraction pass. The driver gate
    * runs each query standalone (one query = one function, each re-running
    * extraction — required by the contract and unchanged by default), but
    * nine queries share the same two extraction passes; a real user
    * materializes the extract once and queries it. Bench opts in so the
    * benchmark total charges the extraction work once, the way a production
    * pipeline would run this surface.
    */
  @volatile private var shareExtract = false
  private val sharedCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def setSharedExtract(on: Boolean): Unit = {
    if (!on) {
      sharedCache.forEach((_, df) => df.unpersist())
      sharedCache.clear()
    }
    shareExtract = on
  }

  private def maybeShared(key: String)(build: => DataFrame): DataFrame =
    if (!shareExtract) build
    else sharedCache.computeIfAbsent(key, _ => {
      val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize eagerly, once
      df
    })

  /** Eagerly materialize the two shared extraction passes (no-ops when
    * sharing is off). Bench calls these as their own TIMED entries so the
    * benchmark total charges each extraction pass exactly once — hidden
    * inside the first query's first rep, a median over reps would discard
    * the materialization cost entirely and the total would charge
    * extraction zero times, not once.
    */
  def materializePlainExtract(spark: SparkSession, dir: String): Unit = {
    extracted(spark, dir); ()
  }
  def materializeFieldsExtract(spark: SparkSession, dir: String): Unit = {
    extractedWithFields(spark, dir); ()
  }

  /** The plain extraction pass over `documents` — shared by
    * x1/x2/x3/a3/a4/a4b when [[setSharedExtract]] is on.
    */
  private def extracted(spark: SparkSession, dir: String): DataFrame =
    maybeShared(s"plain:$dir")(
      ExtractJob.extract(spark, docsFromDocuments(spark, dir)).toDF())

  /** Oracle-checked: section/chunk counts from the engine vs DuckDB's
    * independent paragraph computation (C1/C4 semantics).
    */
  def chunkSectionCounts(spark: SparkSession, dir: String): DataFrame =
    extracted(spark, dir)
      .select(col("doc_id"), col("n_sections"), col("n_chunks"))
      .orderBy("doc_id")

  /** DuckDB `trim()` strips only spaces; the engine strips Python-style
    * whitespace — the oracle trims the explicit ASCII whitespace class so a
    * paragraph of tabs/newlines counts identically in both engines.
    */
  def chunkSectionCountsSql: String =
    """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(list_filter(string_split(text, chr(10)||chr(10)),
         x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != '')) AS INT) AS n_sections,
       CAST(len(list_filter(string_split(text, chr(10)||chr(10)),
         x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != '')) AS INT) AS n_chunks
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

  /** The invoice-preamble extraction pass — shared by x4/a6/a7 when
    * [[setSharedExtract]] is on.
    */
  private def extractedWithFields(spark: SparkSession, dir: String): DataFrame =
    maybeShared(s"fields:$dir")(
      ExtractJob.extract(spark, docsWithFields(spark, dir)).toDF())

  /** Oracle-checked rule extraction: the engine's kv spans vs DuckDB's
    * independent RE2 on the same constructed text. total_amount exercises
    * the Python-float-repr coercion path (1234.50 → "1234.5").
    */
  def ruleFields(spark: SparkSession, dir: String): DataFrame = {
    def kvVal(field: String) = coalesce(
      expr(s"substring(filter(spans, s -> s.kind = 'kv' AND " +
        s"startswith(s.text, '$field='))[0].text, ${field.length + 2})"),
      lit(""))
    extractedWithFields(spark, dir)
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
         regexp_extract(t, '(?:invoice|inv|bill)\s*(?:number|#|no\.?)\s*:?\s*([A-Z0-9-]+)', 1, 'im') AS invoice_number,
         CAST(CAST(regexp_extract(t, '(?:total|amount|sum|due)\s*:?\s*\$?([0-9,]+\.?[0-9]*)', 1, 'im') AS DOUBLE) AS VARCHAR) AS total_amount,
         regexp_extract(t, '([0-9]{1,2}[/-][0-9]{1,2}[/-][0-9]{2,4})', 1, 'im') AS date_value,
         regexp_extract(t, '([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})', 1, 'im') AS email,
         regexp_extract(t, '(\(?[0-9]{3}\)?[-\.\s]?[0-9]{3}[-\.\s]?[0-9]{4})', 1, 'im') AS phone_number
       FROM t ORDER BY doc_id"""

  /** Oracle-checked: the full extraction surface on driver data — DuckDB
    * independently recomputes every column, including the signature-table
    * branch each doc takes: a text doc quantizes to the key (page=1, 'text',
    * bbox 0/0/1000/1000, word_count), so word count 14 hits the CACHE family
    * (3 cached kvs, method "cache", rules skipped — G6) and word count 20
    * hits the OVERRIDE family (global + override rules — F10); anything else
    * is new_family (global rules only). The signature id/event columns
    * themselves are engine-hash-valued and are verified by GoldenSpec (a3)
    * rather than SQL.
    */
  def extractFull(spark: SparkSession, dir: String): DataFrame =
    extracted(spark, dir)
      .select(col("doc_id"), col("file_type"), col("n_kvs"),
        col("rule_coverage"), col("char_count"),
        size(col("spans")).as("n_spans"))
      .orderBy("doc_id")

  /** Match-existence CASE for one rule pattern — the engine's Java regexes
    * are RE2-compatible for these patterns (proven by the x4 value oracle);
    * only existence matters here, so alternation-preference differences
    * cannot bite. All capture groups require >= 1 char, so an empty extract
    * means "no match". Flags mirror the engine's compile
    * (CASE_INSENSITIVE+UNICODE_CASE+MULTILINE ↔ RE2 `im`); the one residual
    * asymmetry is Java MULTILINE's wider line-terminator set (`$` before a
    * bare `\\r`/`\\u2028` also matches there) — moot for every shipped
    * pattern because `\\n` is an explicit alternative wherever `$` appears.
    */
  private def kvCaseSql(pattern: String): String =
    s"CASE WHEN regexp_extract(text, '$pattern', 1, 'im') != '' THEN 1 ELSE 0 END"

  /** Python-whitespace trim class shared by the paragraph oracles. */
  private val WsTrim =
    "' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"

  /** Shared CTE: paragraph count, Python word count, and the per-branch kv
    * count for every doc. Patterns are taken from the LIVE rule tables
    * (RulesEngine.GlobalRules + the OVERRIDE family's rules) at SQL-build
    * time, so a rule edit re-derives the oracle rather than staling it.
    */
  private def extractBaseCte: String = {
    val globalCases = graft.parse.RulesEngine.GlobalRules
      .map(r => kvCaseSql(r.pattern)).mkString("\n           + ")
    val overrideCases = graft.parse.SignatureTable.OverrideFamily.overrideRules
      .map(r => kvCaseSql(r.pattern)).mkString("\n           + ")
    val nCached = graft.parse.SignatureTable.CacheFamily.cachedFields.size
    s"""base AS (
         SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           CAST(length(text) AS BIGINT) AS char_count,
           len(list_filter(string_split(text, chr(10)||chr(10)),
             x -> trim(x, $WsTrim) != '')) AS np,
           len(list_filter(regexp_split_to_array(text, '\\s+'),
             x -> x != '')) AS wc,
           ($globalCases) AS gk,
           ($overrideCases) AS ovk
         FROM documents),
       k AS (
         SELECT doc_id, char_count, np, wc,
           CASE WHEN wc = ${graft.parse.SignatureTable.CacheFamilyWordCount}
                  THEN $nCached
                WHEN wc = ${graft.parse.SignatureTable.OverrideFamilyWordCount}
                  THEN gk + ovk
                ELSE gk END AS n_kvs
         FROM base)"""
  }

  def extractFullSql: String =
    s"""WITH $extractBaseCte
       SELECT doc_id, 'text' AS file_type, CAST(n_kvs AS INT) AS n_kvs,
         CASE WHEN wc = ${graft.parse.SignatureTable.CacheFamilyWordCount} THEN 0.0
              WHEN n_kvs > 0 THEN 1.0 ELSE 0.0 END AS rule_coverage,
         char_count,
         CAST(np + n_kvs + np AS INT) AS n_spans
       FROM k ORDER BY doc_id"""

  /** A6 per-field extraction accuracy vs ground truth
    * (`evaluate_invoices.py:154-206`), sorted by accuracy desc (O2).
    * Ground-truth field labels arrive in DI-vendor spelling and are
    * canonicalized through [[graft.parse.DiNameMap]]
    * (`azure_di_extractor.py:95-122`) at plan-build time — constant-folded,
    * so the executors see only the normalized literals.
    */
  def fieldAccuracy(spark: SparkSession, dir: String): DataFrame = {
    import graft.parse.DiNameMap.normalize
    val rf = ruleFields(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"),
          col("n_chars").cast("string").as("nc")), "doc_id")
    rf.selectExpr("doc_id",
      s"""stack(5,
         '${normalize("InvoiceNumber")}', invoice_number, concat('INV-', doc_id),
         '${normalize("AmountDue")}',     total_amount,   concat(nc, '.5'),
         '${normalize("Date_Value")}',    date_value,     '12/15/2024',
         '${normalize("Email")}',         email,          concat('user', doc_id, '@example.com'),
         '${normalize("Phone_Number")}',  phone_number,   '(555) 123-4567'
       ) AS (field, got, want)""")
      .groupBy(col("field"))
      .agg(count(lit(1)).as("present_in_gt"),
        sum(when(col("got") === col("want"), 1L).otherwise(0L))
          .as("correctly_extracted"),
        (sum(when(col("got") === col("want"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("accuracy"))
      .orderBy(desc("accuracy"), col("field"))
  }

  def fieldAccuracySql: String =
    s"""WITH rf AS ($ruleFieldsInner),
       ev AS (
         SELECT field, got, want FROM rf
         JOIN documents d ON rf.doc_id = CAST(d.doc_id AS VARCHAR)
         CROSS JOIN LATERAL (VALUES
           ('invoice_number', rf.invoice_number, 'INV-' || rf.doc_id),
           ('total_amount',   rf.total_amount,   CAST(d.n_chars AS VARCHAR) || '.5'),
           ('date_value',     rf.date_value,     '12/15/2024'),
           ('email',          rf.email,          'user' || rf.doc_id || '@example.com'),
           ('phone_number',   rf.phone_number,   '(555) 123-4567')
         ) AS v(field, got, want))
       SELECT field, count(*) AS present_in_gt,
         CAST(sum(CASE WHEN got = want THEN 1 ELSE 0 END) AS BIGINT) AS correctly_extracted,
         CAST(sum(CASE WHEN got = want THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS accuracy
       FROM ev GROUP BY field ORDER BY accuracy DESC, field"""

  /** A7 aggregate eval (`evaluate_invoices.py:105-121,189-196`): per-doc
    * precision/recall/F1 against a 6-field ground truth (the 5 extractable
    * fields + `po_number`, which no global rule covers — recall < 1 by
    * construction); aggregates are MEANS of per-doc metrics, matching the
    * reference's macro averaging.
    */
  def evalPrf(spark: SparkSession, dir: String): DataFrame = {
    val rf = ruleFields(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"),
          col("n_chars").cast("string").as("nc")), "doc_id")
    val perDoc = rf.select(col("doc_id"),
      (when(col("invoice_number") =!= "", 1).otherwise(0) +
        when(col("total_amount") =!= "", 1).otherwise(0) +
        when(col("date_value") =!= "", 1).otherwise(0) +
        when(col("email") =!= "", 1).otherwise(0) +
        when(col("phone_number") =!= "", 1).otherwise(0)).as("n_parsed"),
      lit(6).as("n_gt"),
      (when(col("invoice_number") === concat(lit("INV-"), col("doc_id")), 1).otherwise(0) +
        when(col("total_amount") === concat(col("nc"), lit(".5")), 1).otherwise(0) +
        when(col("date_value") === "12/15/2024", 1).otherwise(0) +
        when(col("email") === concat(lit("user"), col("doc_id"), lit("@example.com")), 1).otherwise(0) +
        when(col("phone_number") === "(555) 123-4567", 1).otherwise(0)).as("n_exact"))
      .select(col("doc_id"), col("n_parsed"), col("n_gt"), col("n_exact"),
        // reference guards total_parsed_fields > 0 (evaluate_invoices.py:108):
        // a doc with zero parsed fields scores 0.0, not NaN
        when(col("n_parsed") > 0,
          col("n_exact").cast("double") / col("n_parsed")).otherwise(0.0).as("p"),
        (col("n_exact").cast("double") / col("n_gt")).as("r"))
      .withColumn("f1",
        when(col("p") + col("r") > 0.0,
          lit(2.0) * col("p") * col("r") / (col("p") + col("r"))).otherwise(0.0))
    // macro means rounded to 9 dp: the mean of 500 doubles accumulates in
    // partition-dependent order — rounding makes the oracle compare exact
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      round(avg(col("p")), 9).as("precision"),
      round(avg(col("r")), 9).as("recall"),
      round(avg(col("f1")), 9).as("f1"))
  }

  def evalPrfSql: String =
    s"""WITH rf AS ($ruleFieldsInner),
       pd AS (
         SELECT rf.doc_id,
           (CASE WHEN invoice_number != '' THEN 1 ELSE 0 END +
            CASE WHEN total_amount  != '' THEN 1 ELSE 0 END +
            CASE WHEN date_value    != '' THEN 1 ELSE 0 END +
            CASE WHEN email         != '' THEN 1 ELSE 0 END +
            CASE WHEN phone_number  != '' THEN 1 ELSE 0 END) AS n_parsed,
           6 AS n_gt,
           (CASE WHEN invoice_number = 'INV-' || rf.doc_id THEN 1 ELSE 0 END +
            CASE WHEN total_amount = CAST(d.n_chars AS VARCHAR) || '.5' THEN 1 ELSE 0 END +
            CASE WHEN date_value = '12/15/2024' THEN 1 ELSE 0 END +
            CASE WHEN email = 'user' || rf.doc_id || '@example.com' THEN 1 ELSE 0 END +
            CASE WHEN phone_number = '(555) 123-4567' THEN 1 ELSE 0 END) AS n_exact
         FROM rf JOIN documents d ON rf.doc_id = CAST(d.doc_id AS VARCHAR)),
       m AS (SELECT doc_id,
               CASE WHEN n_parsed > 0 THEN CAST(n_exact AS DOUBLE) / n_parsed ELSE 0.0 END AS p,
               CAST(n_exact AS DOUBLE) / n_gt AS r
             FROM pd)
       SELECT count(*) AS n_docs, round(avg(p), 9) AS precision, round(avg(r), 9) AS recall,
              round(avg(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r) ELSE 0.0 END), 9) AS f1
       FROM m"""

  /** The x4 construction+extraction as a DuckDB CTE body (shared by the
    * eval oracles).
    */
  private def ruleFieldsInner: String =
    """SELECT doc_id,
         regexp_extract(t, '(?:invoice|inv|bill)\s*(?:number|#|no\.?)\s*:?\s*([A-Z0-9-]+)', 1, 'im') AS invoice_number,
         CAST(CAST(regexp_extract(t, '(?:total|amount|sum|due)\s*:?\s*\$?([0-9,]+\.?[0-9]*)', 1, 'im') AS DOUBLE) AS VARCHAR) AS total_amount,
         regexp_extract(t, '([0-9]{1,2}[/-][0-9]{1,2}[/-][0-9]{2,4})', 1, 'im') AS date_value,
         regexp_extract(t, '([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})', 1, 'im') AS email,
         regexp_extract(t, '(\(?[0-9]{3}\)?[-\.\s]?[0-9]{3}[-\.\s]?[0-9]{4})', 1, 'im') AS phone_number
       FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         'Invoice Number: INV-' || CAST(doc_id AS VARCHAR) || chr(10) ||
         'Total: $' || CAST(n_chars AS VARCHAR) || '.50' || chr(10) ||
         'Email: user' || CAST(doc_id AS VARCHAR) || '@example.com' || chr(10) ||
         'Date: 12/15/2024' || chr(10) ||
         'Phone: (555) 123-4567' || chr(10) || chr(10) || text AS t
       FROM documents) s"""

  /** A3 signature statistics (`signatures.py:341-354`): docs per canonical
    * signature family + classification by match event; avg docs/signature.
    * Rows-only (signature ids derive from the engine's own hash).
    */
  def signatureStats(spark: SparkSession, dir: String): DataFrame = {
    val e = extracted(spark, dir)
    e.groupBy(col("signature_id"), col("sig_event"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("sig_similarity")).as("avg_similarity"))
      .orderBy(desc("n_docs"), col("signature_id"))
  }

  /** Unit prices of the reference cost model (`usage_tracker.py:44-46`,
    * env-overridable there; fixed constants here for determinism).
    */
  final case class CostModel(
      llmInputPer1k: Double = 0.0015,
      llmOutputPer1k: Double = 0.0020,
      diPerPage: Double = 0.01)

  /** A4 usage-tracker snapshot (`usage_tracker.py:92-141`) — the
    * deterministic analog: a distributed hash aggregate over per-doc rows
    * instead of a lock-guarded global counter. The snapshot computes the
    * REFERENCE FORMULA (averages with the documents>0 guard, ai_doc_ratio
    * from min(llm+di, docs), cost = unit prices × token/page sums, all
    * rounded as the reference rounds). Rows must carry per-doc counters
    * (`parse_us`, `n_kvs`, `llm_calls`, `di_calls`, `input_tokens`,
    * `output_tokens`, `di_pages`); the pipeline's AI counters are 0 by
    * construction (north rule) but flow through the live formula —
    * UsageSpec feeds nonzero fixtures and checks hand-computed costs.
    */
  def usageSnapshotFrom(perDoc: DataFrame, prices: CostModel = CostModel()): DataFrame = {
    val docs = count(lit(1))
    // sums coalesced to 0 on zero rows — the reference's counters are
    // zero-initialized, so an empty snapshot reports 0, never NULL
    def zsum(c: String) = coalesce(sum(col(c)), lit(0L))
    val secs = zsum("parse_us").cast("double") / 1e6
    val llmCalls = zsum("llm_calls")
    val diCalls = zsum("di_calls")
    val inTok = zsum("input_tokens")
    val outTok = zsum("output_tokens")
    val diPages = zsum("di_pages")
    val guard = (v: org.apache.spark.sql.Column) =>
      when(docs > 0, v).otherwise(0.0)
    val llmCost = (inTok.cast("double") / 1000.0) * prices.llmInputPer1k +
      (outTok.cast("double") / 1000.0) * prices.llmOutputPer1k
    val diCost = diPages.cast("double") * prices.diPerPage
    perDoc.agg(
      docs.as("documents_processed"),
      llmCalls.as("llm_calls"),
      diCalls.as("di_calls"),
      zsum("n_kvs").as("rule_field_hits"),
      inTok.as("input_tokens"),
      outTok.as("output_tokens"),
      diPages.as("di_pages_processed"),
      round(secs, 2).as("total_processing_seconds"),
      round(guard(secs / docs), 2).as("avg_processing_seconds"),
      round(guard(zsum("n_kvs").cast("double") / docs), 1).as("avg_rule_fields_per_doc"),
      round(guard(least(llmCalls + diCalls, docs).cast("double") / docs), 2).as("ai_doc_ratio"),
      round(llmCost, 4).as("llm_cost"),
      round(diCost, 4).as("di_cost"),
      round(llmCost + diCost, 4).as("total_cost"))
  }

  def usageSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val e = extracted(spark, dir)
      .withColumn("llm_calls", lit(0L)).withColumn("di_calls", lit(0L))
      .withColumn("input_tokens", lit(0L)).withColumn("output_tokens", lit(0L))
      .withColumn("di_pages", lit(0L))
    usageSnapshotFrom(e)
  }

  /** The DETERMINISTIC column subset of the A4 snapshot — everything except
    * the wall-clock `total/avg_processing_seconds` — so the counters and
    * the live cost formula get a DuckDB oracle row (the same split x2 makes
    * for engine-hash columns). The full snapshot (a4) stays rows-only for
    * its timing columns; this query proves every SQL-derivable cell of it.
    */
  def usageCounters(spark: SparkSession, dir: String): DataFrame =
    usageSnapshot(spark, dir)
      .drop("total_processing_seconds", "avg_processing_seconds")

  def usageCountersSql: String =
    s"""WITH $extractBaseCte
       SELECT count(*) AS documents_processed,
         CAST(0 AS BIGINT) AS llm_calls,
         CAST(0 AS BIGINT) AS di_calls,
         CAST(sum(n_kvs) AS BIGINT) AS rule_field_hits,
         CAST(0 AS BIGINT) AS input_tokens,
         CAST(0 AS BIGINT) AS output_tokens,
         CAST(0 AS BIGINT) AS di_pages_processed,
         round(CAST(sum(n_kvs) AS DOUBLE) / count(*), 1) AS avg_rule_fields_per_doc,
         CAST(0.0 AS DOUBLE) AS ai_doc_ratio,
         CAST(0.0 AS DOUBLE) AS llm_cost,
         CAST(0.0 AS DOUBLE) AS di_cost,
         CAST(0.0 AS DOUBLE) AS total_cost
       FROM k"""

  /** Rows-only: Boilerpipe-style block classification (R1 stage ii) over
    * HTML built from driver data — a nav + footer of links around the doc's
    * paragraphs; the engine reports per-doc block/kept counts.
    */
  def blockClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val paras = text.split(" ").grouped(30).map(_.mkString(" "))
          .map(p => s"<p>$p</p>").mkString("\n")
        val html =
          s"""<html><body><nav><a href="/">Home</a> <a href="/n">News</a> <a href="/c">Contact</a></nav>
             |<div>$paras</div>
             |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer></body></html>""".stripMargin
        InputDoc(id, Seq(Span("html", html, "", 0)))
      }
    ExtractJob.extract(spark, docs)
      .select(col("doc_id"), col("n_blocks"), col("n_blocks_kept"),
        (col("n_blocks") - col("n_blocks_kept")).as("n_boilerplate"))
      .orderBy("doc_id")
  }

  /** A5 rules statistics (`rules_engine.py:147-153`): counts over the
    * broadcast rule/signature tables — a one-row constant projection (the
    * Spark analog of the reference's in-memory dict; rows-only, the tables
    * are engine constants rather than driver data).
    */
  def rulesStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.parse.{RulesEngine, SignatureTable}
    Seq((RulesEngine.GlobalRules.size.toLong,
      SignatureTable.Default.count(_.overrideRules.nonEmpty).toLong,
      RulesEngine.GlobalRules.count(_.required).toLong))
      .toDF("total_rules", "signature_rule_sets", "global_required_fields")
  }

  /** Oracle-checked: exploded canonical span sequence. For a text doc the
    * sequence is fully determined (FIXTURES.md §4): np section spans
    * (media_ref ""), then n_kvs kv spans (media_ref = the extraction
    * method: "cache" for CACHE-family docs, else "rule"), then np chunk
    * spans (media_ref = `{doc_id}_chunk_{i:03d}`) — DuckDB reconstructs the
    * whole (ord, kind, media_ref) sequence per doc with generate_series.
    */
  def extractSpans(spark: SparkSession, dir: String): DataFrame =
    extracted(spark, dir)
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.order").as("ord"),
        col("span.kind").as("kind"), col("span.media_ref").as("media_ref"))
      .orderBy("doc_id", "ord")

  def extractSpansSql: String =
    s"""WITH $extractBaseCte,
       sec AS (SELECT doc_id,
                 CAST(unnest(generate_series(1, np)) - 1 AS INT) AS ord,
                 'section' AS kind, '' AS media_ref
               FROM k),
       kv AS (SELECT doc_id,
                CAST(np + unnest(generate_series(1, n_kvs)) - 1 AS INT) AS ord,
                'kv' AS kind,
                CASE WHEN wc = ${graft.parse.SignatureTable.CacheFamilyWordCount}
                     THEN 'cache' ELSE 'rule' END AS media_ref
              FROM k),
       ch AS (SELECT doc_id,
                CAST(np + n_kvs + g - 1 AS INT) AS ord, 'chunk' AS kind,
                doc_id || '_chunk_' || printf('%03d', g - 1) AS media_ref
              FROM (SELECT doc_id, np, n_kvs,
                      unnest(generate_series(1, np)) AS g FROM k))
       SELECT * FROM (SELECT * FROM sec UNION ALL SELECT * FROM kv
                      UNION ALL SELECT * FROM ch)
       ORDER BY doc_id, ord"""

  /** x5's DuckDB oracle: an independent replay of the block segmentation +
    * NumWordsRulesClassifier decision over the SAME constructed HTML. The
    * block sequence is nav(3 words, link density 1.0), one block per
    * `<p>` paragraph (ceil(space_tokens/30) groups of 30 space-joined
    * tokens, link density 0), footer(2 words, 1.0) — so n_blocks = P + 2
    * and the decision rule reduces to per-paragraph word-count comparisons
    * against the fixed-ld neighbours, computed here over the group word
    * counts (Python-whitespace words: tokens carry embedded `\\n\\n`).
    * Tokenization mirrors Java `String.split(" ")` — trailing empty tokens
    * dropped, hence the `rtrim` — and a group whose text strips to nothing
    * emits NO block (`gw > 0` gates the block count). The neighbour terms
    * assume no INTERIOR all-whitespace group (one would shift the
    * neighbour indices; the generator corpus is single-spaced, so none
    * exist — and the gates above keep the common edge cases exact).
    */
  def blockClassifySql: String =
    """WITH b AS (
         SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           string_split(rtrim(text, ' '), ' ') AS toks,
           len(string_split(rtrim(text, ' '), ' ')) AS t
         FROM documents),
       g AS (
         SELECT doc_id, t, CAST(ceil(t / 30.0) AS INT) AS p,
           list_transform(generate_series(1, CAST(ceil(t / 30.0) AS INT)), gi ->
             len(list_filter(
               regexp_split_to_array(
                 array_to_string(toks[((gi - 1) * 30 + 1):(least(gi * 30, t))], ' '),
                 '\s+'), x -> x != ''))) AS gw
         FROM b),
       k AS (
         SELECT doc_id, p,
           -- blocks the engine actually emits: a paragraph group whose text
           -- strips to nothing (zero words) never becomes a block
           len(list_filter(gw, w -> w > 0)) AS np,
           list_sum(list_transform(generate_series(1, p), i ->
             CASE WHEN gw[i] <= 0 THEN 0
               WHEN i = 1 THEN
                 CASE WHEN gw[1] > 40
                        OR (CASE WHEN p > 1 THEN gw[2] ELSE 2 END) > 17
                      THEN 1 ELSE 0 END
               ELSE
                 CASE WHEN gw[i] > 16
                        OR (CASE WHEN i < p THEN gw[i + 1] ELSE 2 END) > 15
                        OR gw[i - 1] > 4
                      THEN 1 ELSE 0 END
             END)) AS kept
         FROM g)
       SELECT doc_id, CAST(np + 2 AS INT) AS n_blocks,
         CAST(coalesce(kept, 0) AS INT) AS n_blocks_kept,
         CAST(np + 2 - coalesce(kept, 0) AS INT) AS n_boilerplate
       FROM k ORDER BY doc_id"""

  /** a5's oracle: the reference's three rules-statistics counters as HARD
    * literals (6 global rules of which 2 required — `global_rules.yml`;
    * 2 of the 3 canonical signature families carry override rule sets) —
    * intentionally NOT derived from the engine constants, so a rule-table
    * drift fails the gate instead of re-deriving it away.
    */
  def rulesStatsSql: String =
    """SELECT CAST(6 AS BIGINT) AS total_rules,
       CAST(2 AS BIGINT) AS signature_rule_sets,
       CAST(2 AS BIGINT) AS global_required_fields"""
}
