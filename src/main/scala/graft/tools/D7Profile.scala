package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage decomposition of d7 (lshNearDup) at the driver SF. */
object D7Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"D7 $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops.{DedupOps, VectorOps}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dotProduct(col("embedding"), col("embedding"))))
    t("full d7 (run 1)") { DedupOps.lshNearDup(spark, dir).count() }
    t("full d7 (run 2)") { DedupOps.lshNearDup(spark, dir).count() }
    val bk = VectorOps.bucketIndex(e, DedupOps.NearDupBits, DedupOps.NearDupTables)
    t("bucketIndex count") { bk.count() }
    val cand = DedupOps.lshCandidatePairs(bk)
    t("candidates pre-distinct") { println("  rows=" + cand.count()) }
    t("candidates distinct") { println("  rows=" + cand.distinct().count()) }
    spark.stop()
  }
}
