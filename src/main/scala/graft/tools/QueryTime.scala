package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration: times one SparkEntry
  * query (reps × count()) on a given SF dir with the Bench session
  * settings, and prints the executed plan on request.
  *
  * Usage: runMain graft.tools.QueryTime <query> <sfDir> [reps] [explain]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
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
    name.split(",").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        // same full-result noop accounting as Bench (count() lets Catalyst
        // prune columns and eliminate join subtrees — see Bench.scala)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$q rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val fn0 = graft.SparkEntry.queries(name.split(",").head)
    if (explain) println(fn0(spark, sfDir).queryExecution.executedPlan.toString)
    if (args.contains("countplan"))
      println(fn0(spark, sfDir).groupBy().count().queryExecution.executedPlan.toString)
  }
}
