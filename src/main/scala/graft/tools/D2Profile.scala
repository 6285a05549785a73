package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of d2 (posting-list n-gram jaccard) at the bench
  * SF: times each prefix of the pipeline under noop accounting so the
  * dominant stage is measured, not guessed.
  *
  *   runMain graft.tools.D2Profile [sfDir]
  */
object D2Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.minPartitionNum", (cpus.toInt * 4).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-42s min ${xs.min}%6.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextShingles.shingleHashCol(col("text")).as("shingles"))
      .localCheckpoint()
    val exploded = sh.select(col("doc_id"), explode(col("shingles")).as("h"))
    val postings = exploded.groupBy("h")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")).between(2, graft.ops.DedupOps.MaxShingleDf))
    val pairsNative = postings
      .select(explode(
        graft.functions.TextShingles.orderedPairsCol(col("docs"))).as("p"))
      .filter(col("p.a") =!= col("p.b"))
    val pairsHof = postings
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs")) - i - 1),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .filter(col("p.a") =!= col("p.b"))

    time("explode only")(noop(exploded))
    time("postings (explode+groupBy collect_list)")(noop(postings))
    time("+ pair expand NATIVE")(noop(pairsNative))
    time("+ pair expand HOF")(noop(pairsHof))
    time("+ pair count agg (native)")(noop(
      pairsNative.groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .agg(count(lit(1)).as("inter"))))
    time("full d2")(noop(graft.ops.DedupOps.ngramJaccardPairs(spark, sfDir)))
    spark.stop()
  }
}
