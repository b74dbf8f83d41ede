package org.apache.spark.sql.graftshim

import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.LongType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The position-delete merge walk in isolation, property-tested against a
  * brute-force set-membership reference: `PosFilter.retain` filters a
  * batch's already-kept ordinals by the file's sorted deleted-position
  * array in one forward pass — the hot-path primitive every key-less
  * merge-on-read read runs per batch. */
class PosFilterSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1300L + i)))

  /** A column vector holding the given row-index values. */
  private def vec(rowIdx: Seq[Long]): OnHeapColumnVector = {
    val v = new OnHeapColumnVector(math.max(rowIdx.length, 1), LongType)
    rowIdx.zipWithIndex.foreach { case (x, i) => v.putLong(i, x) }
    v
  }

  private def reference(
      rowIdx: Seq[Long], positions: Array[Long], kept: Seq[Int]): Seq[Int] = {
    val dead = positions.toSet
    kept.filterNot(o => dead.contains(rowIdx(o)))
  }

  test("random batches: retain == brute-force set filter (ascending " +
    "positions, ascending in-batch row indexes, arbitrary kept subsets)") {
    val cases = Gen.zip(
      Gen.chooseNum(0L, 40L),                 // batch's first row index
      Gen.chooseNum(1, 64),                   // batch size
      Gen.listOf(Gen.chooseNum(0L, 120L)))    // deleted positions (any)
    samples(cases, 40).foreach { case (start, n, delsRaw) =>
      val rowIdx = (start until start + n).toSeq
      val dels = delsRaw.distinct.sorted.toArray
      // kept = every ordinal (the common case: no prior equality deletes)
      val kept = Array.range(0, n)
      val k = PosFilter.retain(vec(rowIdx), dels, kept, n)
      assert(kept.take(k).toSeq == reference(rowIdx, dels, 0 until n),
        s"start=$start n=$n dels=${dels.toSeq}")
    }
  }

  test("composes after a prior filter: retain over a SPARSE kept subset " +
    "(the equality-delete pass ran first) matches the reference") {
    val cases = Gen.zip(
      Gen.chooseNum(1, 48),
      Gen.listOf(Gen.chooseNum(0L, 60L)),
      Gen.listOf(Gen.chooseNum(0, 47)))
    samples(cases, 40).foreach { case (n, delsRaw, keptRaw) =>
      val rowIdx = (0L until n.toLong).toSeq
      val dels = delsRaw.distinct.sorted.toArray
      val keptIn = keptRaw.distinct.sorted.filter(_ < n)
      val kept = (keptIn ++ Array.fill(n - keptIn.length)(0)).toArray
      val k = PosFilter.retain(vec(rowIdx), dels, kept, keptIn.length)
      assert(kept.take(k).toSeq == reference(rowIdx, dels, keptIn),
        s"n=$n dels=${dels.toSeq} kept=$keptIn")
    }
  }

  test("edges: empty delete set keeps everything; all-dead batch keeps " +
    "nothing; positions outside the batch's range are skipped harmlessly") {
    val rowIdx = Seq(5L, 6L, 7L, 8L)
    val all = Array.range(0, 4)
    assert(PosFilter.retain(vec(rowIdx), Array.empty[Long], all.clone(), 4) == 4)
    assert(PosFilter.retain(vec(rowIdx), Array(5L, 6L, 7L, 8L), all.clone(), 4) == 0)
    val k = PosFilter.retain(vec(rowIdx), Array(0L, 1L, 100L), all.clone(), 4)
    assert(k == 4)
    // a position list overlapping only the batch's tail
    val kept2 = all.clone()
    val k2 = PosFilter.retain(vec(rowIdx), Array(8L, 9L), kept2, 4)
    assert(kept2.take(k2).toSeq == Seq(0, 1, 2))
  }
}
