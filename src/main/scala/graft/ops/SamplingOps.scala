package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-mixing operators for a training-data pipeline over the
  * `documents` table: deterministic hash-based stratified sampling (the
  * rate-driven mixer) and exact per-stratum quota selection (the
  * count-driven mixer). Corpus construction for LLM training re-weights
  * domains ("sample Wikipedia at 3x, Common Crawl at 0.3x"); both
  * operators express that re-weighting reproducibly — no RNG state, no
  * `TABLESAMPLE` (whose split-level bernoulli draw is neither stable
  * across runs nor expressible in the DuckDB oracle).
  *
  * Membership rule shared by both engines bit-exactly: a document's sample
  * key is `md5(CAST(doc_id AS STRING))` — lowercase hex in Spark and
  * DuckDB alike — and rate tests compare the FIRST 6 HEX CHARS
  * LEXICOGRAPHICALLY against a per-stratum threshold literal. Equal-length
  * lowercase-hex strings compare identically to their numeric values in
  * both engines, so no integer parsing (whose width/signedness could
  * diverge) ever happens. A permille rate r maps to the threshold
  * `hex6(floor(r/1000 * 16^6))`; the quantization error is < 2^-24,
  * invisible next to binomial sampling noise at any corpus size.
  *
  * Scale: s1 is a stateless map-side filter — ONE scan, ZERO shuffles,
  * and the scan reads only (doc_id, source): the mixture decision never
  * touches `text`, so at 100 TB the sampler moves ids, not the corpus
  * (plan-gated in SamplingSpec). s2's exact quotas need a per-stratum
  * rank — one hash Exchange keyed on the stratum, skew bounded by the
  * largest stratum; at web scale prefer s1 with rate = quota/count (a
  * cheap first-pass count), whose O(sqrt(n)) binomial error is below
  * curation noise, and reserve s2 for the final small-stratum exact cut.
  */
object SamplingOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The declared mixture: permille sampling rate per source stratum.
    * Deterministic spread over the 20 corpus sources (50‰ … 905‰, all
    * distinct mod the formula) standing in for a real domain-weight
    * config; a production mixture would arrive as a config literal the
    * same way.
    */
  val RatePermille: Seq[(String, Int)] =
    (0 until 20).map(i => s"src$i" -> (50 + (i * 45) % 900))

  /** Exact per-stratum document quotas for the count-driven mixer. */
  val Quota: Seq[(String, Int)] =
    (0 until 20).map(i => s"src$i" -> (2 + (i * 3) % 16))

  /** 6-hex-char threshold for a permille rate: hex6(floor(r/1000·16^6)).
    * Domain 0..999 — permille 1000 would need a 7th hex char and break the
    * equal-length lexicographic compare (take the whole stratum instead of
    * sampling it). Enforced here; the mixture literal stays in-domain by
    * construction (SamplingSpec re-checks).
    */
  private[ops] def rateThreshold(permille: Int): String = {
    require(permille >= 0 && permille <= 999, s"permille out of [0,999]: $permille")
    f"${(permille.toLong << 24) / 1000L}%06x"
  }

  /** The document's sample key: first 6 hex chars of md5(doc_id-as-string).
    * Shared with c3 ([[CurationOps.curatedMixture]]) — ONE definition of
    * the membership rule, not hand-synced copies.
    */
  private[ops] def sampleKey(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 6)

  /** The per-stratum threshold literal as a CASE over `strat` — the Spark
    * half of the membership rule. [[thresholdCaseSql]] is its DuckDB twin.
    */
  private[ops] def thresholdExpr(strat: Column, rates: Seq[(String, Int)]): Column =
    rates.foldLeft(lit("000000")) { case (acc, (s, r)) =>
      when(strat === s, lit(rateThreshold(r))).otherwise(acc)
    }

  /** DuckDB CASE mirroring [[thresholdExpr]] over stratum column `strat`. */
  private[ops] def thresholdCaseSql(strat: String, rates: Seq[(String, Int)]): String = {
    val cases = rates
      .map { case (s, r) => s"WHEN '$s' THEN '${rateThreshold(r)}'" }
      .mkString(" ")
    s"(CASE $strat $cases ELSE '000000' END)"
  }

  /** DuckDB twin of [[sampleKey]]. */
  private[ops] def sampleKeySql(idCol: String): String =
    s"substr(md5(CAST($idCol AS VARCHAR)), 1, 6)"

  /** s1 — rate-driven stratified sample: keep a document iff its md5 key
    * falls under its stratum's threshold. Map-only; reads 2 of 5 columns.
    */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("source"))
      .filter(sampleKey(col("doc_id")) < thresholdExpr(col("source"), RatePermille))
      .orderBy("doc_id")

  def hashSampleSql: String =
    s"""SELECT doc_id, source FROM documents
       WHERE ${sampleKeySql("doc_id")}
             < ${thresholdCaseSql("source", RatePermille)}
       ORDER BY doc_id"""

  /** s2 — exact per-stratum quota: rank documents inside each source by
    * their md5 key (a stable pseudo-random order; doc_id breaks the
    * impossible tie) and keep rank <= quota(source). One Exchange on the
    * stratum key; strata smaller than their quota are taken whole.
    */
  def mixtureQuota(spark: SparkSession, dir: String): DataFrame = {
    val quota = Quota.foldLeft(lit(0)) { case (acc, (src, q)) =>
      when(col("source") === src, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col("source"))
      .orderBy(sampleKey(col("doc_id")), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .orderBy("source", "rk")
  }

  def mixtureQuotaSql: String = {
    val cases = Quota
      .map { case (src, q) => s"WHEN '$src' THEN $q" }
      .mkString(" ")
    s"""WITH ranked AS (
         SELECT doc_id, source,
           CAST(row_number() OVER (
             PARTITION BY source
             ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), doc_id
           ) AS INT) AS rk
         FROM documents)
       SELECT doc_id, source, rk FROM ranked
       WHERE rk <= (CASE source $cases ELSE 0 END)
       ORDER BY source, rk"""
  }

  /** s3 — temperature-based mixture weights (the multilingual/domain
    * re-balancing rule of mBERT/XLM-R/PaLM data recipes): per source
    * stratum s with token mass n_s, sampling weight
    * w_s = n_s^α / Σ_t n_t^α at temperature α = 1/2, plus the boost factor
    * w_s / (n_s / N) — how much the stratum is up-/down-sampled relative
    * to natural proportions (small sources get boost > 1, dominant ones
    * < 1). α = 1/2 is computed as `sqrt`, which IEEE-754 requires to be
    * correctly rounded — bit-identical across engines, unlike `pow`.
    *
    * Determinism at scale: a double Σ n_t^α depends on summation ORDER,
    * which a distributed aggregate does not fix — so the normalizer is an
    * EXACT integer sum of sqrt quantized to micro-units
    * (`floor(sqrt(n_tokens)·10^6)`), order-independent under any
    * partitioning and identical in the DuckDB oracle; the quantization
    * error (< 10^-6 relative) is invisible next to the corpus-composition
    * noise mixture weighting tolerates by construction. One map-side-
    * combinable Exchange on the stratum key; the one-row totals frame is
    * broadcast. Stratum cardinality is config-scale (domains/languages),
    * never corpus-scale.
    */
  def temperatureWeights(spark: SparkSession, dir: String): DataFrame = {
    val per = docs(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .withColumn("sq", floor(sqrt(col("n_tokens").cast("double")) * 1e6))
    val tot = per.agg(sum("sq").as("z"), sum("n_tokens").as("tot_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("sq").cast("double") / col("z")).as("weight"),
        ((col("sq").cast("double") / col("z")) /
          (col("n_tokens").cast("double") / col("tot_tokens"))).as("boost"))
      .orderBy("source")
  }

  /** Shard count for [[shardShuffle]] (s4). Test-scale literal; production
    * sets this to ceil(corpus_bytes / target_shard_bytes) — shards are the
    * training-time read unit (a few hundred MB each), so one sort task per
    * shard in the write below is the intended granularity, not a skew bug.
    */
  val NumShards = 8

  /** Salted shuffle key: md5("shard:" || doc_id). The salt decorrelates
    * shard assignment from [[sampleKey]]'s mixture membership, so sampling
    * and sharding are independent uniform draws from the same id.
    */
  private[ops] def shuffleKey(idCol: Column): Column =
    md5(concat(lit("shard:"), idCol.cast("string")))

  /** Lower hex6 boundary of shard i (i in 1..NumShards-1): the key space
    * [0, 16^6) cut into NumShards equal lexicographic ranges. The key is
    * uniform, so RANGE sharding on it IS hash sharding — expressed as
    * equal-length lowercase-hex string compares, the same
    * no-integer-parsing contract as [[rateThreshold]].
    */
  private[ops] def shardBoundary(i: Int): String =
    f"${i.toLong * (1L << 24) / NumShards}%06x"

  private[ops] def shardExpr(key6: Column): Column =
    (1 until NumShards).foldLeft(lit(0)) { (acc, i) =>
      when(key6 >= shardBoundary(i), lit(i)).otherwise(acc)
    }

  private[ops] def shardCaseSql(key6: String): String = {
    val whens = (NumShards - 1 to 1 by -1)
      .map(i => s"WHEN $key6 >= '${shardBoundary(i)}' THEN $i")
      .mkString(" ")
    s"(CASE $whens ELSE 0 END)"
  }

  /** s4 — deterministic corpus shuffle + sharding: every training run
    * reads the corpus globally shuffled and split into fixed shards; doing
    * it with RNG state is neither reproducible nor resumable. Here shard =
    * lexicographic range of the salted md5 key ([[shardExpr]]) and `pos` =
    * the document's ordinal within its shard ordered by (full key, doc_id)
    * — a pure function of doc_id, so re-running on a grown corpus moves no
    * previously-written row unless its shard's membership changed.
    *
    * Scale shape: ONE Exchange keyed on the shard plus the per-shard sort —
    * exactly the production write (`repartition(shard)` +
    * `sortWithinPartitions(key)`, where `pos` is implicit in file order);
    * the window form here makes the ordinal explicit and oracle-able. Each
    * shard sorts in one task BY DESIGN: production NumShards =
    * corpus/target-shard-size keeps that sort file-sized (see [[NumShards]]).
    * The scan reads (doc_id, source) only — the shuffle plan never moves
    * document text; at 100 TB the text is rewritten by the writer tasks
    * reading this assignment, or carried through the same plan at one
    * shuffle of corpus size (the unavoidable cost of a global shuffle).
    */
  def shardShuffle(spark: SparkSession, dir: String): DataFrame = {
    val key = shuffleKey(col("doc_id"))
    val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"), key.as("k"))
      .withColumn("shard", shardExpr(substring(col("k"), 1, 6)))
      .select(col("doc_id"), col("source"), col("shard"),
        row_number().over(w).as("pos"))
      .orderBy("shard", "pos")
  }

  def shardShuffleSql: String =
    s"""WITH keyed AS (
         SELECT doc_id, source,
                md5('shard:' || CAST(doc_id AS VARCHAR)) AS k
         FROM documents),
       sharded AS (
         SELECT doc_id, source, k,
                ${shardCaseSql("substr(k, 1, 6)")} AS shard
         FROM keyed)
       SELECT doc_id, source, shard,
              CAST(row_number() OVER (
                PARTITION BY shard ORDER BY k, doc_id) AS INT) AS pos
       FROM sharded ORDER BY shard, pos"""

  /** s5's split boundaries: train < 800‰, valid < 900‰, else test —
    * expressed as the s1 hex6 threshold literals (equal-length
    * lexicographic compares, no integer parsing).
    */
  val TrainBound: String = rateThreshold(800)
  val ValidBound: String = rateThreshold(900)

  /** s5's salted split key: a DIFFERENT salt from the s1 sample key and
    * the s4 shard key, so split membership is independent of both.
    */
  private def splitKey(idCol: Column): Column =
    substring(md5(concat(lit("split:"), idCol.cast("string"))), 1, 6)

  /** s5 — deterministic train/valid/test split manifest: every document
    * is assigned a split as a pure function of doc_id (salted md5 range —
    * reproducible across runs, resumable, no RNG state; the s1 threshold
    * discipline), and the query reports the accounting a training run
    * checks before reading anything: docs and whitespace tokens per
    * (split, lang).
    *
    * Scale shape: one map pass + one map-side-combinable Exchange whose
    * shuffled rows are bounded by 3·|langs|·partitions — the aggregate is
    * config-sized, never corpus-sized. The per-doc assignment itself is
    * the zero-shuffle CASE any downstream reader re-evaluates inline
    * (like s1's membership), so no assignment table need ever be stored.
    */
  def splitManifest(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      // key computed once per row (the s4 'keyed' shape), not once per
      // CASE branch
      .select(splitKey(col("doc_id")).as("k"), col("lang"),
        size(split(col("text"), " ", -1)).cast("long").as("nt"))
      .select(when(col("k") < lit(TrainBound), lit("train"))
        .when(col("k") < lit(ValidBound), lit("valid"))
        .otherwise(lit("test")).as("split"),
        col("lang"), col("nt"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .orderBy("split", "lang")

  def splitManifestSql: String =
    s"""WITH keyed AS (SELECT
         substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6) AS k,
         lang, len(string_split(text, ' ')) AS nt
       FROM documents),
       a AS (SELECT
         CASE WHEN k < '$TrainBound' THEN 'train'
              WHEN k < '$ValidBound' THEN 'valid'
              ELSE 'test' END AS split,
         lang, nt
       FROM keyed)
       SELECT split, lang, count(*) AS n_docs,
              CAST(sum(nt) AS BIGINT) AS n_tokens
       FROM a GROUP BY 1, 2 ORDER BY split, lang"""

  /** s6's target domain: the language whose distribution the corpus is
    * re-weighted toward. A production DSIR run points this at a small
    * curated target set (Wikipedia, books); the corpus's `lang` stratum is
    * the deterministic stand-in with the same dataflow.
    */
  val DsirTargetLang = "en"

  /** s6 — DSIR importance weights (Xie et al., NeurIPS 2023 "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely it is under the TARGET
    * domain's unigram LM than under the full-corpus (source) LM —
    * `log p_target(doc) − log p_source(doc)` — and keep the
    * positive-weight docs. This is the data-selection step between the
    * hygiene filters (t-family) and the mixers (s1-s5): it picks
    * target-LIKE documents out of a web crawl rather than sampling
    * uniformly.
    *
    * Engine-exact arithmetic (the t8 discipline — IEEE-754 requires sqrt
    * correctly rounded but NOT log, so a float log2 could flip a
    * comparison between engines): each token's per-LM surprise is
    * quantized to whole bits via pure integer arithmetic,
    * `bits_x(tok) = bitlen((tot_x + |V|) DIV (cnt_x(tok) + 1))` — add-one
    * (Laplace) smoothing over the corpus vocabulary |V| so target-absent
    * tokens are finite, integer division, binary digit count (the native
    * codegen'd [[graft.functions.IntBits]]). A document's importance is
    * `imp_bits = Σ c(tok)·(bits_source − bits_target)`: positive means
    * the doc is LESS surprising under the target LM — target-like. No
    * float exists until the final division of two exact integers.
    * Unlike t8's `c·cnt` (which crosses 2^63 at corpus scale), the
    * summand here is `c·Δbits` with |Δbits| ≤ 64, so per-doc sums stay
    * integer-exact in BIGINT at any document length.
    *
    * Scale shape: the compact (doc, token, c) aggregate is materialized
    * ONCE (localCheckpoint — its three consumers would otherwise each
    * re-scan and re-tokenize the corpus; the d9/t8 lesson) and the first
    * Exchange is bounded by distinct pairs, not occurrences. Both LM
    * tables are vocab-sized (Heaps' law keeps |V| ≪ corpus; broadcast
    * while memory-small, shuffle on the token key beyond); the two totals
    * are a 1-row broadcast. The final per-doc aggregate shuffles one row
    * per distinct (doc, token) pair. Requires a non-empty target stratum
    * (an empty one nulls every weight, identically in both engines).
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("lang") === DsirTargetLang).as("is_t"),
        explode(split(col("text"), " ")).as("token"))
    val dt = d.groupBy("doc_id", "lang", "is_t", "token")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vs = dt.groupBy("token").agg(sum("c").as("cnt_s"))
    val vt = dt.filter(col("is_t")).groupBy("token").agg(sum("c").as("cnt_t"))
    val totals = vs.agg(sum("cnt_s").as("tot_s"), count(lit(1)).as("vsize"))
      .crossJoin(vt.agg(sum("cnt_t").as("tot_t")))
    // integer division via DIV (the t8 convention) — `/` on BIGINTs is
    // DOUBLE division in Spark and loses exactness past 2^53
    val bitsS = graft.functions.IntBits.bitLength(
      expr("(tot_s + vsize) DIV (cnt_s + 1)")).cast("long")
    val bitsT = graft.functions.IntBits.bitLength(
      expr("(tot_t + vsize) DIV (coalesce(cnt_t, 0) + 1)")).cast("long")
    dt.join(vs, "token")
      .join(vt, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("lang"), col("c"),
        (bitsS - bitsT).as("dbits"))
      .groupBy("doc_id", "lang")
      .agg(sum("c").as("n_tokens"),
        sum(col("c") * col("dbits")).as("imp_bits"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("imp_bits"),
        (col("imp_bits").cast("double") / col("n_tokens")).as("imp_per_tok"),
        (col("imp_bits") > 0).cast("int").as("selected"))
      .orderBy("doc_id")
  }

  def dsirWeightsSql: String =
    s"""WITH d AS (SELECT doc_id, lang, lang = '$DsirTargetLang' AS is_t,
              unnest(string_split(text, ' ')) AS token FROM documents),
       dt AS (SELECT doc_id, lang, is_t, token, count(*) AS c
              FROM d GROUP BY 1, 2, 3, 4),
       vs AS (SELECT token, CAST(sum(c) AS BIGINT) AS cnt_s FROM dt GROUP BY 1),
       vt AS (SELECT token, CAST(sum(c) AS BIGINT) AS cnt_t
              FROM dt WHERE is_t GROUP BY 1),
       ts AS (SELECT CAST(sum(cnt_s) AS BIGINT) AS tot_s,
                CAST(count(*) AS BIGINT) AS vsize FROM vs),
       tt AS (SELECT CAST(sum(cnt_t) AS BIGINT) AS tot_t FROM vt),
       j AS (SELECT dt.doc_id, dt.lang, dt.c,
               CAST(length(format('{:b}',
                 (ts.tot_s + ts.vsize) // (vs.cnt_s + 1))) AS BIGINT)
               - CAST(length(format('{:b}',
                 (tt.tot_t + ts.vsize) // (coalesce(vt.cnt_t, 0) + 1)))
                 AS BIGINT) AS dbits
             FROM dt JOIN vs USING (token) LEFT JOIN vt USING (token), ts, tt),
       agg AS (SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(sum(c * dbits) AS BIGINT) AS imp_bits
               FROM j GROUP BY 1, 2)
       SELECT doc_id, lang, n_tokens, imp_bits,
         CAST(imp_bits AS DOUBLE) / n_tokens AS imp_per_tok,
         CAST(imp_bits > 0 AS INT) AS selected
       FROM agg ORDER BY doc_id"""

  def temperatureWeightsSql: String =
    """WITH per AS (SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
       q AS (SELECT source, n_docs, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS sq
           FROM per),
       tot AS (SELECT CAST(sum(sq) AS BIGINT) AS z,
               CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM q)
       SELECT source, n_docs, n_tokens,
              CAST(sq AS DOUBLE)/z AS weight,
              (CAST(sq AS DOUBLE)/z)
                / (CAST(n_tokens AS DOUBLE)/tot_tokens) AS boost
       FROM q, tot ORDER BY source"""
}
