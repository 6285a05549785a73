package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes `shared_extract_plain`'s bench cost: the first
  * materialization of the shared extraction pass is the FIRST Spark job of
  * the bench JVM, so it carries whole-stage-codegen/Janino compilation,
  * parquet-reader and typed-encoder warmup. This harness materializes the
  * plain pass cold, then clears the share cache and re-materializes it
  * warm in the same JVM — the delta is the one-time warmup, the warm
  * number is the operator.
  *
  *   runMain graft.tools.WarmupProfile [sfDir]
  */
object WarmupProfile {
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
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    graft.ops.ExtractQueries.setSharedExtract(true)
    time("plain materialize (cold)") {
      graft.ops.ExtractQueries.materializePlainExtract(spark, sfDir)
    }
    time("fields materialize (warm)") {
      graft.ops.ExtractQueries.materializeFieldsExtract(spark, sfDir)
    }
    // drop the cache, re-materialize the SAME pass warm
    graft.ops.ExtractQueries.setSharedExtract(false)
    graft.ops.ExtractQueries.setSharedExtract(true)
    time("plain materialize (warm)") {
      graft.ops.ExtractQueries.materializePlainExtract(spark, sfDir)
    }
    time("plain materialize (warm 2)") {
      graft.ops.ExtractQueries.setSharedExtract(false)
      graft.ops.ExtractQueries.setSharedExtract(true)
      graft.ops.ExtractQueries.materializePlainExtract(spark, sfDir)
    }
    // how much of the warm materialization is the columnar persist vs the
    // extraction itself: the same pass with no persist, noop-sunk
    graft.ops.ExtractQueries.setSharedExtract(false)
    time("plain extract, NO persist (noop)") {
      graft.SparkEntry.queries("x2_extract_full")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("x5 block classify (noop)") {
      graft.SparkEntry.queries("x5_block_classify")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
