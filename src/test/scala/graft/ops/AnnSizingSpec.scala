package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[AnnSizing]] to the round-5 measured recall grid
  * (`graft.tools.AnnRecallSweep`, n=10⁵, BASELINE.md round-5 table): the
  * single-point formula evaluated at each band's measured mean planted
  * cosine must land within ±0.05 of every measured cell (the sweep's
  * per-pair-averaged prediction was within ±0.026; the band-mean point
  * evaluation loses a little to the ±0.05 cosine spread). Plus inversion
  * properties: `tablesFor` is the minimal table count reaching the target,
  * and `operatingPoint` composes the two rules.
  */
class AnnSizingSpec extends AnyFunSuite {

  // (band mean planted cosine, bits, tables, measured recall) —
  // data/r5_validation.log ann_recall_sweep rows, n=100000.
  private val measured = Seq(
    (0.8482, 9, 4, 0.543), (0.8482, 9, 8, 0.780), (0.8482, 9, 16, 0.945),
    (0.8482, 11, 4, 0.411), (0.8482, 11, 8, 0.645), (0.8482, 11, 16, 0.858),
    (0.8482, 13, 4, 0.296), (0.8482, 13, 8, 0.506), (0.8482, 13, 16, 0.739),
    (0.8986, 9, 4, 0.682), (0.8986, 9, 8, 0.895), (0.8986, 9, 16, 0.987),
    (0.8986, 11, 4, 0.560), (0.8986, 11, 8, 0.799), (0.8986, 11, 16, 0.953),
    (0.8986, 13, 4, 0.444), (0.8986, 13, 8, 0.693), (0.8986, 13, 16, 0.891),
    (0.9492, 9, 4, 0.858), (0.9492, 9, 8, 0.980), (0.9492, 9, 16, 0.999),
    (0.9492, 11, 4, 0.772), (0.9492, 11, 8, 0.946), (0.9492, 11, 16, 0.997),
    (0.9492, 13, 4, 0.682), (0.9492, 13, 8, 0.899), (0.9492, 13, 16, 0.988))

  test("predictedRecall matches the 27 measured stress-grid cells within 0.05") {
    for ((cos, bits, tables, rec) <- measured) {
      val pred = AnnSizing.predictedRecall(cos, bits, tables)
      assert(math.abs(pred - rec) <= 0.05,
        s"cos=$cos bits=$bits T=$tables predicted=$pred measured=$rec")
    }
  }

  test("tablesFor is the minimal table count reaching the target recall") {
    for (cos <- Seq(0.85, 0.90, 0.95); bits <- Seq(9, 11, 13);
         target <- Seq(0.8, 0.9, 0.95, 0.99)) {
      val t = AnnSizing.tablesFor(cos, bits, target)
      assert(AnnSizing.predictedRecall(cos, bits, t) >= target,
        s"cos=$cos bits=$bits target=$target t=$t under-recalls")
      if (t > 1)
        assert(AnnSizing.predictedRecall(cos, bits, t - 1) < target,
          s"cos=$cos bits=$bits target=$target t=$t not minimal")
    }
  }

  test("bitsFor and operatingPoint compose the two rules") {
    assert(AnnSizing.bitsFor(1000000L, 64L) == 14)     // the r4 AnnScale point
    assert(AnnSizing.bitsFor(1L << 20, 1L << 11) == 9) // exact power-of-two ratio
    assert(AnnSizing.bitsFor(100L, 200L) == 1)         // floor
    // BASELINE.md round-5 worked example: recall ≥0.95 at band 0.90 with
    // bits=11 needs T=16; at band 0.85 it needs T≈24.
    assert(AnnSizing.tablesFor(0.8986, 11, 0.95) == 16)
    assert(math.abs(AnnSizing.tablesFor(0.8482, 11, 0.95) - 24) <= 1)
    val op = AnnSizing.operatingPoint(1000000L, 64L, 0.90, 0.95)
    assert(op.bits == 14 && op.predictedRecall >= 0.95)
    assert(op.tables == AnnSizing.tablesFor(0.90, 14, 0.95))
  }
}
