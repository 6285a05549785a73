package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c1 — the composed training-data curation funnel over `documents`: the
  * canonical pretraining-pipeline shape, built entirely from the operator
  * family this engine already ships (t1 language-ID, t2 quality, d1 exact
  * dedup, d2 posting-list jaccard, t3 token accounting) chained the way a
  * production curation job chains them. One row per stage with the
  * surviving document count and BPE-token budget:
  *
  *   0 all      — every document
  *   1 lang     — t1's stopword language pick != 'und'
  *   2 quality  — t2's keep flag (n_chars >= 100 AND n_tokens >= 20)
  *   3 exact    — d1 semantics: min doc_id per md5(text) group among
  *                stage-2 survivors (one hash-aggregate + semi join)
  *   4 neardup  — d2's df-pruned posting-list jaccard pairs at tau = 0.8
  *                among stage-3 survivors; DROP every doc that pairs with
  *                a smaller doc_id. One-pass pair-min-id semantics, by
  *                design: on a transitive chain A~B~C (A<B<C, A!~C) both B
  *                and C drop even though B (C's only qualifying partner)
  *                was itself dropped — the standard scalable one-pass rule,
  *                an upper bound on connected-components dedup
  *                aggressiveness. The DuckDB oracle applies the identical
  *                rule, so the gate pins the semantics, not just the count.
  *
  * Scale shape: one scan computes all flags; the exact-dedup stage is one
  * hash shuffle on content_hash; the near-dup stage reuses d2's bounded
  * posting-list machinery (ONE shuffle on the 60-bit shingle hash,
  * df-capped fan-out) over the already-filtered survivor set — filters
  * run BEFORE the expensive pair stage, exactly how a 100 TB curation run
  * must be ordered. No UDFs, no driver-side loops; token totals ride the
  * same aggregates.
  */
object CurationOps {

  val NearDupTau = 0.8

  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val base = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"), txt,
      TextOps.langPredCol(txt).as("lang_pred"),
      TextOps.qualityKeepCol(txt).as("qual_ok"),
      md5(txt.cast("binary")).as("content_hash"),
      TextOps.bpeTokensCol(txt).as("n_bpe"))

    val s1 = base.filter(col("lang_pred") =!= "und")
    val s2 = s1.filter(col("qual_ok"))
    // d1 semantics among survivors: keeper = min doc_id per content hash
    val keepers = s2.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s3 = s2.join(keepers, Seq("doc_id"), "left_semi")
    // d2 pairs at tau among stage-3 survivors; drop the larger id of each
    val drops = DedupOps
      .ngramJaccardPairsOn(s3.select(col("doc_id"), col("text")), NearDupTau)
      .select(col("doc_b").as("doc_id")).distinct()
    val s4 = s3.join(drops, Seq("doc_id"), "left_anti")

    def stage(id: Int, name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_bpe")), lit(0L)).as("n_bpe_tokens"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), col("n_bpe_tokens"))

    stage(0, "all", base)
      .union(stage(1, "lang", s1))
      .union(stage(2, "quality", s2))
      .union(stage(3, "exact", s3))
      .union(stage(4, "neardup", s4))
      .orderBy("stage_id")
  }

  /** DuckDB twin: the same five stages as CTEs; the near-dup stage repeats
    * d2's posting-list SQL (df cap 100, 60-bit md5-prefix hash) over the
    * stage-3 survivors with the tau floor.
    */
  def curationFunnelSql: String =
    s"""WITH base AS (
         SELECT doc_id, text,
                (${TextOps.langCaseSql}) AS lang_pred,
                (length(text) >= 100 AND len(string_split(text, ' ')) >= 20) AS qual_ok,
                md5(text) AS content_hash,
                CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe
         FROM (SELECT *, ${TextOps.langBestSql} AS best FROM documents)),
       s1 AS (SELECT * FROM base WHERE lang_pred <> 'und'),
       s2 AS (SELECT * FROM s1 WHERE qual_ok),
       k AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY content_hash),
       s3 AS (SELECT s2.* FROM s2 JOIN k USING (doc_id)),
       toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM s3),
       sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                generate_series(1, greatest(len(t)-2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
              FROM toks),
       cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       hs AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT) AS h FROM sh),
       keep AS (SELECT h FROM hs GROUP BY 1 HAVING count(*) <= 100),
       pr AS (SELECT hs.doc_id, hs.h FROM hs JOIN keep USING (h)),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                 FROM pr a JOIN pr b ON a.h = b.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       drops AS (SELECT DISTINCT doc_b AS doc_id
                 FROM pairs JOIN cnt ca ON doc_a = ca.doc_id
                 JOIN cnt cb ON doc_b = cb.doc_id
                 WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= $NearDupTau),
       s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
       funnel AS (
         SELECT 0 AS stage_id, 'all' AS stage, count(*) AS n_docs,
                coalesce(sum(n_bpe), 0) AS n_bpe_tokens FROM base
         UNION ALL SELECT 1, 'lang', count(*), coalesce(sum(n_bpe), 0) FROM s1
         UNION ALL SELECT 2, 'quality', count(*), coalesce(sum(n_bpe), 0) FROM s2
         UNION ALL SELECT 3, 'exact', count(*), coalesce(sum(n_bpe), 0) FROM s3
         UNION ALL SELECT 4, 'neardup', count(*), coalesce(sum(n_bpe), 0) FROM s4)
       SELECT CAST(stage_id AS INT) AS stage_id, stage,
              CAST(n_docs AS BIGINT) AS n_docs,
              CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens
       FROM funnel ORDER BY stage_id"""
}
