package graft.ops

/** Analytic operating-point selection for the random-hyperplane LSH family
  * shared by d7 ([[DedupOps.lshNearDupOn]]) and v4 ([[VectorOps]] bucketed
  * ANN). The collision model — a hyperplane separates two vectors at angle
  * θ with probability θ/π, so a `bits`-bit bucket key collides with
  * `p^bits`, `p = 1 − acos(cosθ)/π`, and `tables` independent tables
  * recall `1 − (1 − p^bits)^tables` — was validated by measurement in
  * round 5 (`graft.tools.AnnRecallSweep`, n=10⁵, 27 stress-grid points at
  * cosine bands 0.85/0.90/0.95: measured recall within ±0.026 of this
  * formula everywhere; BASELINE.md round-5 table). That makes the sizing
  * problem at 100 TB closed-form: `bits` comes from the bucket-size/cost
  * budget, `tables` from the recall target at the hardest cosine the
  * near-dup threshold must still catch — no sweep rerun needed.
  *
  * Everything here is pure driver-side arithmetic over the job's scalar
  * parameters; nothing touches a plan.
  */
object AnnSizing {

  /** P(one hyperplane puts both vectors on the same side) for a pair at
    * `cosTheta`.
    */
  def collisionProb(cosTheta: Double): Double = {
    val c = math.max(-1.0, math.min(1.0, cosTheta))
    1.0 - math.acos(c) / math.Pi
  }

  /** Predicted recall of a (bits, tables) point for pairs at `cosTheta`. */
  def predictedRecall(cosTheta: Double, bits: Int, tables: Int): Double = {
    require(bits > 0 && tables > 0, s"bits=$bits tables=$tables")
    1.0 - math.pow(1.0 - math.pow(collisionProb(cosTheta), bits), tables)
  }

  /** Bits for a target mean bucket size: `ceil(log2(n / targetBucket))`,
    * floored at 1. Controls candidate-generation cost — expected per-list
    * pair fan-out is O(targetBucket²) per table.
    */
  def bitsFor(n: Long, targetBucket: Long): Int = {
    require(n > 0 && targetBucket > 0, s"n=$n targetBucket=$targetBucket")
    math.max(1, math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
  }

  /** Smallest table count whose predicted recall at `cosTheta` reaches
    * `targetRecall` for the given `bits`:
    * `ceil(ln(1−target) / ln(1−p^bits))`.
    */
  def tablesFor(cosTheta: Double, bits: Int, targetRecall: Double): Int = {
    require(targetRecall > 0.0 && targetRecall < 1.0, s"targetRecall=$targetRecall")
    val miss = 1.0 - math.pow(collisionProb(cosTheta), bits)
    require(miss < 1.0, s"p^bits underflowed for cosTheta=$cosTheta bits=$bits")
    math.max(1, math.ceil(math.log(1.0 - targetRecall) / math.log(miss)).toInt)
  }

  /** Full operating point: bits from the bucket budget, tables from the
    * recall target at the hardest (lowest-cosine) pair the threshold must
    * recall, plus the predicted recall actually achieved at that point.
    */
  final case class OperatingPoint(bits: Int, tables: Int, predictedRecall: Double)

  def operatingPoint(n: Long, targetBucket: Long, hardestCos: Double,
                     targetRecall: Double): OperatingPoint = {
    val b = bitsFor(n, targetBucket)
    val t = tablesFor(hardestCos, b, targetRecall)
    OperatingPoint(b, t, predictedRecall(hardestCos, b, t))
  }
}
