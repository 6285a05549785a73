package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import graft.corpus.CorpusGen
import graft.parse.{DocParser, SignatureTable}

/** Pure parse-core thread scaling (no Spark): upper bound for the Spark
  * job's scaling efficiency. Generates the same deterministic corpus
  * in-memory and parses it on a fixed-size thread pool.
  *
  * runMain graft.tools.CoreScaling <nDocs> <threads,threads,...>
  */
object CoreScaling {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(60000)
    val threadCounts = args.lift(1).getOrElse("8,32").split(",").map(_.toInt)
    val docs = (0L until n.toLong).toArray.map(CorpusGen.gen)
    System.err.println(s"generated $n docs")

    def run(threads: Int): Double = {
      val idx = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          val pool = DocParser.pooled(SignatureTable.Default)
          var i = idx.getAndIncrement()
          var sink = 0L
          while (i < docs.length) {
            sink += DocParser.parse(docs(i), pool).spans.length
            i = idx.getAndIncrement()
          }
          if (sink == -1) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    run(math.min(8, threadCounts.min)) // warmup
    threadCounts.foreach { t =>
      val secs = (1 to 3).map(_ => run(t)).min
      println(f"""{"threads":$t,"sec":$secs%.3f,"docs_per_sec":${n / secs}%.1f}""")
    }
  }
}
