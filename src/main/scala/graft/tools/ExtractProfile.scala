package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.jobs.ExtractJob
import graft.parse.{DocParser, SignatureTable}

/** Ad-hoc decomposition of extract-job overheads vs the pure parse core.
  * runMain graft.tools.ExtractProfile [corpusDir]
  */
object ExtractProfile {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/repo/data/docs/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = ExtractJob.readDocs(spark, corpus).cache()
    val n = docs.count()

    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val s = xs.min
      println(f"$label%-34s ${s}%6.3f s  ${n / s}%9.0f docs/s")
    }

    val bc = spark.sparkContext.broadcast(SignatureTable.Default)

    time("full extract (repart+rows+agg)") {
      ExtractJob.extract(spark, docs).agg(sum(size(col("spans")))).head()
    }
    time("extract, no repartition") {
      docs.mapPartitions { it =>
        val pool = DocParser.pooled(bc.value)
        it.map(d => DocParser.parse(d, pool))
      }.agg(sum(size(col("spans")))).head()
    }
    time("repart + parse, count-only out") {
      docs.repartition(cpus * 4).mapPartitions { it =>
        val pool = DocParser.pooled(bc.value)
        it.map(d => DocParser.parse(d, pool).spans.length.toLong)
      }.agg(sum(col("value"))).head()
    }
    time("no repart, count-only out") {
      docs.mapPartitions { it =>
        val pool = DocParser.pooled(bc.value)
        it.map(d => DocParser.parse(d, pool).spans.length.toLong)
      }.agg(sum(col("value"))).head()
    }
    time("no repart, decode-only") {
      docs.mapPartitions { it =>
        var acc = 0L
        it.foreach(d => acc += d.spans.length)
        Iterator.single(acc)
      }.agg(sum(col("value"))).head()
    }
    time("repart only, no parse") {
      docs.repartition(cpus * 4).mapPartitions { it =>
        var acc = 0L
        it.foreach(d => acc += d.spans.length)
        Iterator.single(acc)
      }.agg(sum(col("value"))).head()
    }
    spark.stop()
  }
}
