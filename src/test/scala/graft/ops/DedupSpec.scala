package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** d7 (LSH-bucketed embedding near-dup) must return exactly d6's exact
  * all-pairs top-50 on the test data — full recall of the brute-force
  * result — while planning as equi-joins (no BroadcastNestedLoopJoin /
  * CartesianProduct; asserted here next to the equality so the two gates
  * travel together).
  */
class DedupSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("dedup-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("d7 lshNearDup == d6 embedNearDup top-50 (bucketed candidates, exact rescore)") {
    spark.sparkContext.setLogLevel("WARN")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = rows(DedupOps.embedNearDup(spark, sfDir))
    val lsh = rows(DedupOps.lshNearDup(spark, sfDir))
    assert(exact.size == 50 && lsh.size == 50)
    assert(exact.map(t => (t._1, t._2)) == lsh.map(t => (t._1, t._2)),
      "LSH candidate generation missed a true top-50 pair")
    exact.zip(lsh).foreach { case ((_, _, ce), (_, _, cl)) =>
      assert(math.abs(ce - cl) < 1e-12, s"cosine drift: $ce vs $cl")
    }
  }

  test("d7 plans as equi-joins: no all-pairs join anywhere") {
    val plan = DedupOps.lshNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"d7 fell back to an all-pairs join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"d7 fell back to a cartesian product:\n$plan")
    // the rescore must never SORT the candidate stream: sort-merge on the
    // pair side (chosen once the vector table outgrows the broadcast
    // threshold) spilled >77 GB and died at n=10⁶ — the embedding sides
    // are hinted to shuffled hash builds (AQE may upgrade to broadcast at
    // tiny SF, which is also sort-free; only SortMergeJoin is the failure)
    assert(!plan.contains("SortMergeJoin"),
      s"d7 rescore sorted the candidate stream:\n$plan")
  }

  test("d2 posting-list pairs: no self-join, no all-pairs join") {
    val plan = DedupOps.ngramJaccardPairs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d3 minhash: per-row fold, ZERO shuffles") {
    val plan = DedupOps.minhash(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"minhash must be a per-row array fold, not an explode+groupBy:\n$plan")
  }

  test("d4 band pairs: no join at all (posting-list expansion, one band shuffle)") {
    val plan = DedupOps.lshPairs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"d4 must pair inside grouped band buckets, not via a self-join:\n$plan")
    // band-bucket agg + distinct = 2 hash exchanges, no more (minhash is
    // now a per-row fold with none; the original union-of-selects
    // self-join planned 8 logical evaluations of a minhash AGGREGATE and
    // leaned on ReuseExchange to dedupe them)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges <= 2, s"expected <=2 hash exchanges in d4 plan:\n$plan")
  }

  test("vector queries run the native DotProduct expression, not the HOF fallback") {
    val p1 = VectorOps.annTopK(spark, sfDir).queryExecution.executedPlan.toString
    assert(p1.toLowerCase.contains("dotproduct"), s"v1 lost the native dot:\n$p1")
    val p2 = DedupOps.lshNearDup(spark, sfDir).queryExecution.executedPlan.toString
    assert(p2.toLowerCase.contains("dotproduct"), "d7 lost the native dot")
    // v3's distance runs the |a-c|^2 = a.a - 2 a.c + c.c expansion on the
    // native expression — no interpreted HOF, no sequence(0,63) literal
    val p3 = VectorOps.clusterStats(spark, sfDir).queryExecution.executedPlan.toString
    assert(p3.toLowerCase.contains("dotproduct"), s"v3 lost the native dot:\n$p3")
    assert(!p3.contains("sequence(0, 63"), "v3 still hard-codes 64 dims")
  }

  test("d5 simhash is a single-pass aggregate (one hash exchange, no bit explode)") {
    val plan = DedupOps.simhash(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange:\n$plan")
  }
}
