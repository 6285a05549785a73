package graft.jobs

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.parse.DocParser
import java.nio.file.Files

/** Kill/rerun test for the zero-shuffle file-granular resume: interrupted
  * job (some input files committed, one partial garbage output dir) resumes
  * reading ONLY the pending input files and converges byte-identically.
  */
class FileResumeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("file-resume-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hashes(out: String): Map[String, String] = {
    import spark.implicits._
    spark.read.parquet(s"$out/results")
      .select("doc_id", "spans").as[(String, Seq[graft.model.OutSpan])]
      .collect().map { case (d, s) => d -> DocParser.spanHash(s) }.toMap
  }

  test("file-granular resume: no shuffle, no reprocessing, identical convergence") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Files.createTempDirectory("graft_fresume_").toString
    val in = s"$base/docs"
    spark.range(0, 400, 1, 8).map(i => CorpusGen.gen(i)).write.parquet(in)
    val files = FileResumableExtract.inputFiles(spark, in)
    assert(files.size == 8)

    // uninterrupted
    val outA = s"$base/outA"
    assert(FileResumableExtract.run(spark, in, outA) == 400L)
    val golden = hashes(outA)
    assert(golden.size == 400)

    // "killed": only 3 of 8 files commit, plus a partial garbage dir
    val outB = s"$base/outB"
    val firstThree = files.take(3)
      .map(p => FileResumableExtract.fileId(
        new org.apache.hadoop.fs.Path(p).getName)).toSet
    val n1 = FileResumableExtract.run(spark, in, outB, onlyFiles = Some(firstThree))
    assert(n1 > 0 && n1 < 400)
    val someId = FileResumableExtract.fileId(
      new org.apache.hadoop.fs.Path(files.last).getName)
    val partial = new java.io.File(s"$outB/results/file_id=$someId")
    partial.mkdirs()
    Files.writeString(partial.toPath.resolve("part-corrupt.txt"), "junk")

    // resume processes exactly the remainder
    val n2 = FileResumableExtract.run(spark, in, outB)
    assert(n1 + n2 == 400L, s"$n1 + $n2 != 400")
    assert(hashes(outB) == golden)
    assert(!Files.exists(partial.toPath.resolve("part-corrupt.txt")))

    // idempotent third run
    assert(FileResumableExtract.run(spark, in, outB) == 0L)
    assert(FileResumableExtract.completedFileIds(spark, outB).size == 8)
  }
}
