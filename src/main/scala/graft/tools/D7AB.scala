package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the two d7 candidate-dedup strategies in one JVM. */
object D7AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{DedupOps, VectorOps}
    val dot = graft.functions.VectorExprs.dotProduct _
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val bk = VectorOps.bucketIndex(e, DedupOps.NearDupBits, DedupOps.NearDupTables)
    def cand: DataFrame = DedupOps.lshCandidatePairs(bk)
    val ea = e.select(col("vec_id").as("ia"), col("embedding").as("ea"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("ib"), col("embedding").as("eb"), col("nrm").as("nb"))
    def score(c: DataFrame): DataFrame = c.join(ea, "ia").join(eb, "ib")
      .select(col("ia"), col("ib"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
    def a(): Long = score(cand.distinct())
      .orderBy(desc("cosine"), col("ia"), col("ib")).limit(50).count()
    def b(): Long = score(cand)
      .orderBy(desc("cosine"), col("ia"), col("ib")).limit(50 * 20)
      .distinct().orderBy(desc("cosine"), col("ia"), col("ib")).limit(50).count()
    def t(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"D7AB $l: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    t("warmA")(a()); t("warmB")(b())
    (1 to 3).foreach { i => t(s"A$i")(a()); t(s"B$i")(b()) }
    spark.stop()
  }
}
