package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language-ID (stopword heuristic), quality scoring,
  * token counting, document fingerprinting. All pure `functions._` columns
  * (whole-stage codegen, no UDFs); every metric derives from integer string
  * ops so the DuckDB oracle matches bit-exactly.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Non-overlapping left-to-right occurrence count of " word " in padded
    * text via split — identical scan semantics in Spark and DuckDB.
    */
  private def occ(padded: Column, word: String): Column =
    (size(split(padded, java.util.regex.Pattern.quote(s" $word "), -1)) - 1).cast("int")

  private val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"))

  private def langScores(txt: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), txt, lit(" "))
    StopwordSets.map { case (lang, ws) =>
      lang -> ws.map(w => occ(padded, w)).reduce(_ + _)
    }
  }

  /** The t1 language pick as a single column over any text column — shared
    * with the c1 curation funnel's language-filter stage.
    */
  private[graft] def langPredCol(txt: Column): Column = {
    val scores = langScores(txt)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // earlier langs win ties (en > es > de > fr): en's WHEN ends outermost
    scores.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, s)) => when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Language-ID: stopword-count heuristic; argmax with fixed priority
    * order, 'und' (undetermined) when all scores are zero.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scores = langScores(col("text"))
    val pickOrdered = langPredCol(col("text"))
    docs(spark, dir)
      .select(col("doc_id"),
        scores.head._2.as("score_en"),
        scores(1)._2.as("score_es"),
        scores(2)._2.as("score_de"),
        scores(3)._2.as("score_fr"),
        pickOrdered.as("lang_pred"))
      .orderBy("doc_id")
  }

  private def occSql(w: String) =
    s"len(string_split(' ' || text || ' ', ' $w ')) - 1"

  private def langSqlExprs: Seq[(String, String)] =
    StopwordSets.map { case (lang, ws) =>
      lang -> ws.map(occSql).mkString("(", " + ", ")")
    }

  /** DuckDB `greatest(score_en, …)` expression over `text` (for a subquery
    * that aliases it `best`); pairs with [[langCaseSql]].
    */
  private[ops] def langBestSql: String =
    "greatest(" + langSqlExprs.map(_._2).mkString(", ") + ")"

  /** DuckDB CASE mirroring [[langPredCol]]; expects `best` in scope. */
  private[ops] def langCaseSql: String =
    langSqlExprs.map { case (lang, e) =>
      s"WHEN $e = best AND best > 0 THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")

  def langIdSql: String = {
    val exprs = langSqlExprs
    val bestExpr = langBestSql
    val caseExpr = langCaseSql
    s"""SELECT doc_id,
        CAST(${exprs(0)._2} AS INT) AS score_en,
        CAST(${exprs(1)._2} AS INT) AS score_es,
        CAST(${exprs(2)._2} AS INT) AS score_de,
        CAST(${exprs(3)._2} AS INT) AS score_fr,
        $caseExpr AS lang_pred
        FROM (SELECT *, $bestExpr AS best FROM documents)
        ORDER BY doc_id"""
  }

  /** t2's composite keep flag over any text column (shared with c1). */
  private[graft] def qualityKeepCol(txt: Column): Column =
    (length(txt) >= 100 && size(split(txt, " ", -1)) >= 20).cast("boolean")

  /** t3's BPE-ish token count over any text column (shared with c1). */
  private[graft] def bpeTokensCol(txt: Column): Column =
    size(regexp_extract_all(txt, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
      .cast("long")

  /** Quality scoring: length / token / punctuation / uppercase features +
    * a composite keep/drop flag — the filters a pretraining pipeline runs.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val nChars = length(txt)
    val nTokens = size(split(txt, " ", -1))
    val nAlpha = length(regexp_replace(txt, "[^a-zA-Z]", ""))
    val nDigit = length(regexp_replace(txt, "[^0-9]", ""))
    val meanWordLen = (length(regexp_replace(txt, " ", "")).cast("double") / nTokens)
    docs(spark, dir).select(
      col("doc_id"),
      nChars.as("n_chars"),
      nTokens.cast("int").as("n_tokens"),
      nAlpha.as("n_alpha"),
      nDigit.as("n_digit"),
      meanWordLen.as("mean_word_len"),
      (nChars >= 100 && nTokens >= 20).cast("boolean").as("keep"))
      .orderBy("doc_id")
  }

  def qualitySql: String =
    """SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT) AS n_alpha,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INT) AS n_digit,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_word_len,
       (length(text) >= 100 AND len(string_split(text, ' ')) >= 20) AS keep
       FROM documents ORDER BY doc_id"""

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    docs(spark, dir).select(
      col("doc_id"),
      // explicit ASCII whitespace class: Java \s includes \x0B, RE2's \s
      // does not — spelling the class keeps both engines identical
      size(split(txt, "[ \\t\\n\\x0B\\f\\r]+", -1)).cast("int").as("n_ws_tokens"),
      size(regexp_extract_all(txt, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
        .cast("int").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  def tokenCountSql: String =
    """SELECT doc_id,
       CAST(len(string_split_regex(text, '[ \t\n\x0B\f\r]+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS n_bpe_tokens
       FROM documents ORDER BY doc_id"""

  /** Document fingerprint: md5 of case/whitespace-normalized text
    * (the canonical near-exact-dedup key).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(lower(trim(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]+", " "))).cast("binary"))
        .as("fingerprint"))
      .orderBy("doc_id")

  def fingerprintSql: String =
    """SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS fingerprint
       FROM documents ORDER BY doc_id"""

  /** t5 — within-document repetition stats (the Gopher-rule family): total
    * tokens, distinct tokens, duplicate-token fraction, and the most
    * frequent token's share. High duplicate/top fractions mark boilerplate
    * and degenerate generations a pretraining pipeline drops.
    *
    * Scale shape: the statistics are strictly within-document, so the
    * native [[graft.functions.TokenStats]] expression computes all three
    * counts in one pass per row — ZERO shuffles (the one Exchange is the
    * presentation ORDER BY). The declarative explode + groupBy(doc_id,
    * tok) + groupBy(doc_id) formulation — which the DuckDB oracle mirrors
    * and HygieneSpec re-derives — would shuffle the corpus's distinct
    * (doc, token) pairs for nothing (measured 4.8 s vs 0.5 s at sf0.1).
    * Fractions are exact IEEE doubles from integer counts, so the oracle
    * matches bit-for-bit.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.TokenStats.statsCol(col("text"))
    docs(spark, dir)
      .select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        col("st").getItem(0).as("n_tokens"),
        col("st").getItem(1).as("n_distinct"),
        ((col("st").getItem(0) - col("st").getItem(1)).cast("double")
          / col("st").getItem(0)).as("dup_frac"),
        (col("st").getItem(2).cast("double") / col("st").getItem(0))
          .as("top_frac"))
      .orderBy("doc_id")
  }

  def repetitionSql: String =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       freq AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
       st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                count(*) AS n_distinct, max(c) AS top_count
              FROM freq GROUP BY doc_id)
       SELECT doc_id, n_tokens, n_distinct,
         CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens AS dup_frac,
         CAST(top_count AS DOUBLE) / n_tokens AS top_frac
       FROM st ORDER BY doc_id"""

  /** t6 — corpus vocabulary statistics (tokenizer-training prep): token
    * frequency table with Zipf rank and cumulative corpus coverage — the
    * table a BPE/unigram tokenizer build starts from, and the quickest
    * sanity check on a new corpus snapshot (a coverage curve that reaches
    * 0.99 in ten tokens means degenerate text).
    *
    * Scale shape: the token-frequency aggregate is the only corpus-size
    * Exchange (map-side combinable — partial counts per partition, so
    * shuffled rows are bounded by |vocab|·partitions, not token count).
    * The rank/coverage window runs unpartitioned on the AGGREGATED table,
    * whose size is the vocabulary — ≤ a few million rows for any real
    * corpus (Heaps' law), a deliberate single-partition pass over config-
    * scale data, not a corpus-scale sort. `cum_frac` divides two exact
    * integers — engine-deterministic, no running double sum.
    */
  def vocab(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
    val ord = Window.orderBy(col("cnt").desc, col("token"))
    cnt.select(col("token"), col("cnt"),
        row_number().over(ord).as("rank"),
        sum("cnt").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
        sum("cnt").over(Window.partitionBy()).as("tot"))
      .select(col("token"), col("cnt"), col("rank"),
        (col("cum").cast("double") / col("tot")).as("cum_frac"))
      .orderBy("rank")
  }

  def vocabSql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
       w AS (SELECT token, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
               CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS tot
             FROM cnt)
       SELECT token, cnt, rank, CAST(cum AS DOUBLE)/tot AS cum_frac
       FROM w ORDER BY rank"""
}
