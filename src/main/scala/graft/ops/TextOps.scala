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

  /** t9's output size: the top-K adjacent-pair table. */
  val BigramTopK = 100

  /** t9 — corpus bigram (adjacent token pair) frequency table: the
    * statistic ONE round of BPE/WordPiece merge training is computed
    * from — the top pair is the first merge. Iterating merges is a
    * driver-side loop re-running this query over re-tokenized text; at
    * corpus scale each round is exactly this shape, which is why
    * tokenizer training is feasible on the full corpus at all.
    *
    * Scale shape: the pair explode doubles nothing (n−1 pairs per n-token
    * doc); the count aggregate is map-side combinable, so the one
    * Exchange shuffles ≤ distinct-bigrams·partitions rows; the top-K is
    * TakeOrdered (no global sort of the bigram table); the rank window
    * runs on the K-row result. Ties break lexicographically so the table
    * is deterministic.
    */
  def bigramMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("t")
    val top = docs(spark, dir)
      .select(split(col("text"), " ").as("t"))
      .filter(size(t) >= 2)
      .select(explode(transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("bigram"))
      .limit(BigramTopK)
    top.select(col("bigram"), col("cnt"),
      row_number().over(Window.orderBy(desc("cnt"), col("bigram"))).as("rank"))
      .orderBy("rank")
  }

  def bigramMergeSql: String =
    s"""WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
       bg AS (SELECT unnest(list_transform(
                generate_series(1, greatest(len(t) - 1, 0)),
                i -> t[i] || ' ' || t[i + 1])) AS bigram FROM tk),
       c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1),
       top AS (SELECT bigram, cnt FROM c
               ORDER BY cnt DESC, bigram LIMIT $BigramTopK)
       SELECT bigram, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, bigram) AS INT) AS rank
       FROM top ORDER BY rank"""

  /** PII redaction patterns — shared verbatim with the DuckDB oracle.
    * Deliberately RE2-safe (no lookaround, no backreferences, no possessive
    * quantifiers), so Java regex (Spark codegen) and RE2 (DuckDB) scan
    * identically: leftmost match, greedy quantifiers over character
    * classes have the same leftmost-first semantics in both engines.
    *
    * The phone pattern REQUIRES the international `+` prefix — precision
    * over recall, deliberately: a bare 8+-digit run is indistinguishable
    * from an id (an optional `+` made any long numeric id — including the
    * digits of a doc_id ≥ 10⁷ inside a planted email local part — count
    * as a phone), and RE2-safe patterns can't express the lookaround a
    * contextual disambiguation would need.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** t7 — PII scrub (the Dolma/RedPajama hygiene step): count and redact
    * email addresses, phone numbers and IPv4 addresses. The synthetic
    * `documents` text carries no PII, so the op enriches each row with a
    * deterministic PII suffix derived from (doc_id, source, n_chars) —
    * built by the IDENTICAL expression in the DuckDB oracle, the m1-m3
    * synthesis convention — then runs the real redaction machinery over
    * it: three match-counts plus the md5/length of the fully redacted
    * text, so the entire redacted string is value-checked without
    * shipping it.
    *
    * Scale shape: a pure per-row map — zero joins, zero aggregates; the
    * only Exchange is the presentation ORDER BY's range partitioning
    * (gated in HygieneSpec). regexp_extract_all/regexp_replace are
    * codegen'd Spark natives, so the whole operator is one
    * WholeStageCodegen pass per partition at any corpus size.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(4))
    val pii = when(m === 1,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@"),
          col("source"), lit(".example.com")))
      .when(m === 2,
        concat(lit(" call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"), lit("-"),
          lpad(pmod(col("n_chars"), lit(1000)).cast("string"), 3, "0")))
      .when(m === 3,
        concat(lit(" host 10."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit("."), pmod(col("n_chars"), lit(256)).cast("string"),
          lit("."), pmod(col("doc_id") + col("n_chars"), lit(256)).cast("string")))
      .otherwise(lit(""))
    val rich = concat(col("text"), pii)
    val clean =
      regexp_replace(
        regexp_replace(
          regexp_replace(rich, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>")
    docs(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(rich, lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(rich, lit(PhoneRe), lit(0))).as("n_phone"),
      size(regexp_extract_all(rich, lit(Ipv4Re), lit(0))).as("n_ip"),
      length(clean).as("clean_len"),
      md5(clean.cast("binary")).as("clean_hash"))
      .orderBy("doc_id")
  }

  def piiScrubSql: String = {
    val pii =
      s"""CASE doc_id % 4
          WHEN 1 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com'
          WHEN 2 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || '-' || lpad(CAST(n_chars % 1000 AS VARCHAR), 3, '0')
          WHEN 3 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(n_chars % 256 AS VARCHAR)
                      || '.' || CAST((doc_id + n_chars) % 256 AS VARCHAR)
          ELSE '' END"""
    s"""WITH rich AS (SELECT doc_id, text || $pii AS r FROM documents),
       red AS (SELECT doc_id, r,
                 regexp_replace(regexp_replace(regexp_replace(r,
                   '$EmailRe', '<EMAIL>', 'g'),
                   '$PhoneRe', '<PHONE>', 'g'),
                   '$Ipv4Re', '<IP>', 'g') AS clean
               FROM rich)
       SELECT doc_id,
         CAST(len(regexp_extract_all(r, '$EmailRe')) AS INT) AS n_email,
         CAST(len(regexp_extract_all(r, '$PhoneRe')) AS INT) AS n_phone,
         CAST(len(regexp_extract_all(r, '$Ipv4Re')) AS INT) AS n_ip,
         CAST(length(clean) AS INT) AS clean_len,
         md5(clean) AS clean_hash
       FROM red ORDER BY doc_id"""
  }

  /** t8 — per-document token rarity under the corpus's own unigram LM
    * (the CCNet perplexity-filter shape with the KenLM model replaced by
    * the corpus unigram distribution): for each document, the mean corpus
    * probability of its tokens, the rarest token's corpus count, and a
    * mean per-token surprise in BITS. Documents whose tokens are
    * uniformly corpus-rare are foreign/degenerate relative to the corpus
    * — the rows a perplexity filter drops.
    *
    * Engine-exact arithmetic, by construction: IEEE-754 requires sqrt to
    * be correctly rounded but NOT log, so a float log2 could differ in
    * the last ulp between the JVM and DuckDB's libm and break a
    * floor/quantize gate. Instead the per-token surprise is quantized to
    * whole bits via pure integer arithmetic: bits(tok) =
    * length(bin(tot DIV cnt)) = floor(log2(tot div cnt)) + 1 — integer
    * division, binary-digit count, no float anywhere until the final
    * single division of two exact integers (bit-identical in any IEEE
    * engine, the s3 quantization discipline).
    *
    * Scale shape: (doc_id, token) partial counts bound the first shuffle
    * by distinct pairs, not token occurrences; the compact `dt` aggregate
    * (ids + tokens, no document text) is materialized ONCE via
    * localCheckpoint — the production `persist(DISK_ONLY)` shape, and the
    * d9 lesson: its three consumers (vocab build, corpus total, probe
    * side) would otherwise each re-scan and re-tokenize the corpus, and
    * ReuseExchange cannot unify them because column pruning gives each
    * branch a differently-canonicalized aggregate. The executed plan is
    * gated to ZERO parquet re-scans in HygieneSpec. The vocab join is
    * vocab-sized on the build side (broadcast while |vocab| is
    * memory-small, shuffle on the token key beyond — Heaps' law keeps
    * |vocab| ≪ corpus); the corpus-total is a one-row broadcast (d10's
    * nCorpus shape). Final per-doc aggregate shuffles one row per
    * distinct (doc, token) pair.
    */
  def rarity(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val dt = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vocab = dt.groupBy("token").agg(sum("c").as("cnt"))
    val tot = vocab.agg(sum("cnt").as("tot"))
    dt.join(vocab, "token")
      .crossJoin(broadcast(tot))
      // native bit count — length(bin(x)) semantics without allocating a
      // binary string per (doc, token) pair (IntBitsSpec pins equality)
      .select(col("doc_id"), col("c"), col("cnt"), col("tot"),
        graft.functions.IntBits.bitLength(expr("tot DIV cnt"))
          .cast("long").as("bits"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        min("cnt").as("min_cnt"),
        // c·cnt can reach n_tokens·tot ≈ 10¹⁹-10²⁰ at a 100 TB corpus
        // (heavy-tail multi-MB docs × 10¹³ corpus tokens) — past BIGINT,
        // an ANSI ArithmeticException in Spark and an out-of-range error
        // in DuckDB. Widen the product+sum to exact DECIMAL (HUGEINT on
        // the oracle side); still integer-exact, no float until the end.
        sum(col("c").cast("decimal(19,0)") * col("cnt").cast("decimal(19,0)"))
          .as("sum_cnt"),
        sum(col("c") * col("bits")).as("sum_bits"),
        max("tot").as("tot"))
      .select(col("doc_id"), col("n_tokens"), col("min_cnt"),
        // sequential double divisions — n_tokens·tot as one integer
        // product would itself overflow; each step is IEEE-exact-rounded
        // from exact integers, identically in both engines
        (col("sum_cnt").cast("double") / col("n_tokens") / col("tot"))
          .as("mean_prob"),
        (col("sum_bits").cast("double") / col("n_tokens")).as("mean_bits"))
      .orderBy("doc_id")
  }

  def raritySql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       dt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
       vocab AS (SELECT token, CAST(sum(c) AS BIGINT) AS cnt FROM dt GROUP BY 1),
       tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM vocab),
       j AS (SELECT dt.doc_id, dt.c, v.cnt, tt.tot,
               CAST(length(format('{:b}', tt.tot // v.cnt)) AS BIGINT) AS bits
             FROM dt JOIN vocab v USING (token), tt),
       agg AS (SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 min(cnt) AS min_cnt,
                 sum(CAST(c AS HUGEINT) * cnt) AS sum_cnt,
                 CAST(sum(c * bits) AS BIGINT) AS sum_bits,
                 max(tot) AS tot
               FROM j GROUP BY doc_id)
       SELECT doc_id, n_tokens, min_cnt,
         CAST(sum_cnt AS DOUBLE) / n_tokens / tot AS mean_prob,
         CAST(sum_bits AS DOUBLE) / n_tokens AS mean_bits
       FROM agg ORDER BY doc_id"""
}
