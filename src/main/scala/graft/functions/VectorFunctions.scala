package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column expressions (`Array[Float]`/`Array[Double]`
  * columns), built on `zip_with`/`aggregate` so the dot product stays in
  * whole-stage codegen — no UDF, no vector-type conversion.
  *
  * All math is done in double precision with a sequential left-fold in
  * index order, which makes results bit-deterministic (needed for the
  * oracle compare) and engine-portable.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(toDouble(a), lit(0.0d), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0d, 0.0d).otherwise(dot(a, b) / denom)
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x))

  /** Random-hyperplane LSH signature: bit i = sign of dot(v, plane_i).
    * Planes are pseudo-random but fully deterministic (seeded), generated
    * inline as literals by the caller via [[randomPlanes]]. */
  def hyperplaneSignature(v: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.length <= 64,
      s"at most 64 planes fit a Long signature (got ${planes.length}) — " +
        "shiftleft wraps at 64, silently aliasing plane i with plane i-64; " +
        "use banded signatures (NativeExpressions.hyperplaneBands) for more planes")
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0.0d, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic seeded hyperplanes for [[hyperplaneSignature]]. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
