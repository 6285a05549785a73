package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Multimodal plumbing shapes: frame sampling (1 row in, every stride-th
  * fixed-size frame out) and stub resize bounds — the decode itself is the
  * documented stub, the distributed shape is what's asserted.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sampleFrames: every stride-th fixed-size frame, ragged tail kept") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 1000 bytes of value 7, frameSize 256 → frames 0..3 (sizes 256,256,256,232),
    // stride 3 → sampled idx 0 and 3
    val media = Seq(MultimodalOps.MediaRow(1L, Array.fill(1000)(7.toByte))).toDS()
    val frames = MultimodalOps.sampleFrames(media, frameSize = 256, stride = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3))
    assert(frames.map(_.frame_bytes).toSeq == Seq(256, 232))
    frames.foreach(f => assert(f.mean_byte == 7.0))
    // empty payload → zero frames
    val none = MultimodalOps.sampleFrames(
      Seq(MultimodalOps.MediaRow(2L, Array.empty[Byte])).toDS()).collect()
    assert(none.isEmpty)
  }

  test("stub resize: bounded output, deterministic, no-op when already small") {
    val d = new MultimodalOps.StubDecoder
    val big = Array.tabulate(5000)(i => (i % 251).toByte)
    val t = d.resize(big, 8, 8)
    assert(t.length == 64)
    assert(t.sameElements(d.resize(big, 8, 8)))
    val small = Array[Byte](1, 2, 3)
    assert(d.resize(small, 8, 8).sameElements(small))
  }
}
