package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** d9 (decontamination) and t5 (repetition stats) gates: values re-derived
  * in plain JVM code over the real test table, and the d9 plan keeps the
  * benchmark side broadcast (the corpus must never shuffle to meet a small
  * eval set).
  */
class HygieneSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("hygiene-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The d2-family 60-bit shingle hash: first 15 hex chars of md5. */
  private def shingleHash(sh: String): Long =
    java.lang.Long.parseLong(md5Hex(sh).substring(0, 15), 16)

  private def shingles(text: String): Set[Long] = {
    val t = text.split(" ", -1)
    (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
      .distinct.map(shingleHash).toSet
  }

  private def docRows(): Seq[(Long, String)] = {
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("d9 overlap counts equal the JVM-re-derived shingle-set intersections") {
    val mod = DedupOps.BenchmarkMod
    val rows = docRows()
    val benchSet = rows.filter(_._1 % mod == 0).flatMap(r => shingles(r._2)).toSet
    assert(benchSet.nonEmpty, "stand-in benchmark must be non-empty at sf0.001")
    val expected = rows.filter(_._1 % mod != 0)
      .map { case (id, tx) => (id, (shingles(tx) & benchSet).size.toLong) }
      .filter(_._2 > 0).sortBy(_._1)
    val got = DedupOps.decontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // benchmark docs themselves are never reported as contaminated
    assert(got.forall(_._1 % mod != 0))
  }

  test("d9 plan: benchmark side broadcast, corpus never sort-merge-joined") {
    val plan = DedupOps.decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("t5 repetition stats equal the JVM-re-derived token statistics") {
    val rows = docRows()
    val expected = rows.map { case (id, tx) =>
      val toks = tx.split(" ", -1).toSeq
      val freq = toks.groupBy(identity).map(_._2.size)
      val n = toks.size.toLong
      val nd = freq.size.toLong
      (id, n, nd,
        (n - nd).toDouble / n,
        freq.max.toDouble / n)
    }.sortBy(_._1)
    val got = TextOps.repetition(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
  }

  test("t5 plan: zero shuffles beyond the presentation sort (native per-row stats)") {
    val plan = TextOps.repetition(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, plan)
    assert(!plan.contains("HashAggregate"), plan)
  }
}
