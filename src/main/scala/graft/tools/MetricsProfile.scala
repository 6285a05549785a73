package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decomposition of the file-resume metrics phase (the ~5s
  * scale-invariant tail in the whole-job scaling record): how much is the
  * results re-read + aggregate vs the dynamic-overwrite metrics write.
  * Usage: runMain graft.tools.MetricsProfile <corpusDir>
  */
object MetricsProfile {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/repo/data/docs/sf1.0")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = "/dev/shm/graft-bench/metrics_profile"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.jobs.FileResumableExtract.run(spark, corpus, out)

    val dirs = new java.io.File(s"$out/results").listFiles()
      .filter(_.getName.startsWith("file_id=")).map(_.toString).toSeq
    println(s"partition dirs: ${dirs.size}")

    val read = t("read+schema (lazy)") {
      spark.read.option("basePath", s"$out/results").parquet(dirs: _*)
    }
    val rows = t("unitMetrics agg collect") {
      graft.jobs.ExtractJob.unitMetrics(read, "file_id").collect()
    }
    println(s"metric rows: ${rows.length}")
    val tiny = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      graft.jobs.ExtractJob.unitMetrics(read, "file_id").schema)
    t("dynamic-overwrite write of precomputed rows") {
      graft.sources.DocStore.withDynamicOverwrite(spark) {
        tiny.write.mode(SaveMode.Overwrite).partitionBy("file_id")
          .parquet(s"$out/metrics2")
      }
    }
    t("dynamic-overwrite write AGAIN (overwrite path)") {
      graft.sources.DocStore.withDynamicOverwrite(spark) {
        tiny.write.mode(SaveMode.Overwrite).partitionBy("file_id")
          .parquet(s"$out/metrics2")
      }
    }
    t("full current metrics phase (read+agg+write)") {
      graft.sources.DocStore.withDynamicOverwrite(spark) {
        graft.jobs.ExtractJob.unitMetrics(
          spark.read.option("basePath", s"$out/results").parquet(dirs: _*),
          "file_id")
          .write.mode(SaveMode.Overwrite).partitionBy("file_id")
          .parquet(s"$out/metrics3")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.stop()
  }
}
