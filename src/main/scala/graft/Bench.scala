package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.jobs.ExtractJob

/** Per-round benchmark (driver-run → BENCH_r{N}.json; see BASELINE.md).
  *
  * Times every SparkEntry query on SPARK_GRAFT_SF_DIR — REPS in-process
  * repetitions each, reporting the per-query MEDIAN (this VM's shared-host
  * variance is ±10-50% run-to-run; single timings have decided scoreboards
  * they shouldn't) — plus the HEADLINE metric from BASELINE.json:
  * end-to-end extraction throughput over the deterministic interleaved
  * corpus (median of 3 warm runs). Scaling efficiency evidence (N vs 4N
  * cores) is produced by graft.ScalingBench and recorded in BASELINE.md —
  * one JVM per parallelism level.
  *
  * Output: ONE bare JSON line on stdout and stderr. These stay unprefixed
  * because build.sbt sets `run / outputStrategy := StdoutOutput`, making
  * the forked JVM inherit the real stdout/stderr — without it sbt pipes
  * the fork through its `[info]`-prefixing logger, which made round 1/2
  * driver artifacts unparseable. (Raw FileDescriptor.out does NOT bypass
  * the piping: the fork's fd 1 IS the pipe to sbt.) A copy persists to
  * SPARK_GRAFT_BENCH_FILE.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // same scan-split granularity as JobSession/ScalingBench: local
      // corpora pack into too few default 128m splits for clean waves
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.files.minPartitionNum", (cpus.toInt * 4).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def median(xs: Seq[Double]): Double = BenchUtil.median(xs)

    // Nine driver queries share two extraction passes; a production user
    // materializes the extract once and queries it, so the bench does too
    // (first query per pass pays the materialization; the gate still runs
    // every query standalone). SPARK_GRAFT_SHARED_EXTRACT=0 reverts to the
    // per-query re-extraction accounting of rounds 1-3.
    val sharedExtract =
      sys.env.getOrElse("SPARK_GRAFT_SHARED_EXTRACT", "1") == "1"
    graft.ops.ExtractQueries.setSharedExtract(sharedExtract)

    // Same-process tenancy calibration: the pure-thread parse ceiling
    // (CoreScaling's kernel, no Spark) measured in THIS bench's window, so
    // round-over-round per-query deltas can be read off
    // calibration-normalized numbers instead of guessing whether a ±25%
    // swing is the engine or the shared VM (the host's hour-to-hour
    // variance has repeatedly exceeded real regressions).
    val calibDocsPerSec = {
      val n = 20000
      val docs = (0L until n.toLong).toArray.map(graft.corpus.CorpusGen.gen)
      def run(): Double = {
        val idx = new java.util.concurrent.atomic.AtomicInteger(0)
        val t0 = System.nanoTime()
        val ts = (1 to cpus.toInt).map { _ =>
          new Thread(() => {
            val pool = graft.parse.DocParser.pooled(graft.parse.SignatureTable.Default)
            var i = idx.getAndIncrement()
            var sink = 0L
            while (i < docs.length) {
              sink += graft.parse.DocParser.parse(docs(i), pool).spans.length
              i = idx.getAndIncrement()
            }
            if (sink == -1) println("")
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        n / ((System.nanoTime() - t0) / 1e9)
      }
      run() // warmup
      (1 to 3).map(_ => run()).max // ceiling = best of 3
    }

    // When extraction is shared, its two materializations are timed
    // EXPLICITLY as first-class entries (included in the total) — the
    // per-query medians below then measure post-cache query time only.
    val materializeTimings: Seq[(String, Double)] =
      if (!sharedExtract) Seq.empty
      else Seq(
        "shared_extract_plain" ->
          (() => graft.ops.ExtractQueries.materializePlainExtract(spark, sfDir)),
        "shared_extract_fields" ->
          (() => graft.ops.ExtractQueries.materializeFieldsExtract(spark, sfDir)))
        .map { case (name, f) =>
          val t0 = System.nanoTime()
          f()
          name -> (System.nanoTime() - t0) / 1e9
        }

    val failures = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets Catalyst prune every column
        // that doesn't affect cardinality (map-only queries degrade to a
        // parquet row count) and even eliminate whole join subtrees — c1's
        // count() plan collapsed to a LocalTableScan because the funnel
        // left-joins a unique-keyed aggregate (round-5 finding, BASELINE.md).
        // The noop write computes every output column the user would read.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        }
        catch {
          case e: Throwable =>
            // a broken query must never masquerade as a fast one — and its
            // partial wall time must not pollute the headline total either
            if (!failures.contains(name)) failures += name
            System.err.println(s"BENCH FAILURE $name: $e")
            None
        }
      }
      name -> (if (times.isEmpty) -1.0 else median(times))
    }

    // Headline: extraction docs/sec over the deterministic interleaved
    // corpus (generated in-session if not on disk — no external data).
    val corpusDir = sys.env.getOrElse("SPARK_GRAFT_CORPUS", "/root/repo/data/docs/sf0.1")
    val docs =
      if (new java.io.File(corpusDir).exists()) ExtractJob.readDocs(spark, corpusDir)
      else spark.range(0, 60000, 1, 64).map(i => graft.corpus.CorpusGen.gen(i))
    docs.cache()
    val nDocs = docs.count()
    def parseOnce(): Unit = {
      ExtractJob.extract(spark, docs).agg(sum(size(col("spans")))).head()
    }
    parseOnce() // warmup
    val extractSec = median((1 to 3).map { _ =>
      val t0 = System.nanoTime(); parseOnce(); (System.nanoTime() - t0) / 1e9
    })
    val docsPerSec = nDocs / extractSec

    val allTimings =
      results ++ materializeTimings ++ Map("extract_corpus_60k" -> extractSec)
    val qs = allTimings.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Calibration-normalized twin of every timing: seconds this query would
    // take on a machine whose pure-thread parse ceiling is the NOMINAL
    // 100k docs/sec (sec × calib/100k). Raw seconds move with VM tenancy;
    // normalized seconds move with the engine.
    val nominal = 100000.0
    val qsNorm = allTimings.map { case (k, v) =>
      val n = if (v < 0) -1.0 else v * calibDocsPerSec / nominal
      s"\"" + k + "\":" + n
    }.mkString("{", ",", "}")
    // failed queries report -1 in `queries` and are EXCLUDED from the total
    val total = allTimings.values.filter(_ >= 0).sum
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val maxPartBytes = sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", "16m")
    val minPartNum = cpus.toInt * 4
    val json =
      s"""{"metric":"total_sec_plus_extract_headline","value":$total,"unit":"sec","reps":$reps,"shared_extract":$sharedExtract,"queries":$qs,"queries_normalized":$qsNorm,"calibration_docs_per_sec":$calibDocsPerSec,"calibration_nominal_docs_per_sec":$nominal,"failed_queries":$fails,"extract_docs_per_sec":$docsPerSec,"extract_docs_per_sec_normalized":${docsPerSec * nominal / calibDocsPerSec},"extract_docs":$nDocs,"cpus":$cpus,"max_partition_bytes":"$maxPartBytes","min_partition_num":$minPartNum,"sf":"$sfDir"}"""
    // build.sbt sets `run / outputStrategy := StdoutOutput`, so the forked
    // JVM inherits the real stdout — this line reaches the sbt caller bare,
    // with no [info] prefix; a stderr copy covers stdout-discarding callers
    println(json)
    System.err.println(json)
    val benchFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "/root/repo/BENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Path.of(benchFile), json + "\n")
    catch {
      case e: Throwable =>
        // a silently-stale BENCH.json would be read as this run's result
        System.err.println(s"WARNING: could not write $benchFile: $e")
    }
    spark.stop()
  }
}
