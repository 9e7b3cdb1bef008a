package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Invariants of q99's chunk-boundary arithmetic (64-token windows,
  * stride 48), checked over the formula both engines compute:
  * nChunks = 1 + max(0, ceil((n - 64) / 48)) and chunk i covers
  * token indices [i*48, min(i*48 + 64, n)). Every token must land in
  * at least one window, consecutive full windows overlap exactly 16
  * tokens, no window is empty, and the final window reaches exactly
  * the document tail — the properties that make the chunk manifest a
  * lossless cover of the corpus. */
object ChunkProps extends Properties("ChunkProps") {
  private val C = 64
  private val S = 48

  private def nChunks(n: Int): Int =
    1 + math.max(0, math.ceil((n - C).toDouble / S).toInt)

  private def windows(n: Int): Seq[(Int, Int)] =
    (0 until nChunks(n)).map(i => (i * S, math.min(i * S + C, n)))

  private val sizes = Gen.choose(1, 2000)

  property("every token is covered by some window") = forAll(sizes) { n =>
    val covered = Array.fill(n)(false)
    for ((a, b) <- windows(n); i <- a until b) covered(i) = true
    covered.forall(identity)
  }

  property("no window is empty") = forAll(sizes) { n =>
    windows(n).forall { case (a, b) => b > a }
  }

  property("the last window ends exactly at the tail") = forAll(sizes) { n =>
    windows(n).last._2 == n
  }

  property("consecutive windows overlap by at least C - S, exactly so off-tail") =
    forAll(sizes) { n =>
      // Every non-last window is full (only the tail clamps), so the
      // overlap b1 - a2 is exactly C - S except into the tail window,
      // which may overlap MORE (it still starts on the stride grid but
      // can end early) — never less, or tokens would be orphaned.
      windows(n).sliding(2).forall {
        case Seq((_, b1), (a2, b2)) =>
          val ov = b1 - a2
          if (b2 < n) ov == C - S else ov >= C - S || b2 - a2 < C
        case _ => true
      }
    }

  property("windows advance monotonically and by the stride") = forAll(sizes) { n =>
    windows(n).map(_._1) == (0 until nChunks(n)).map(_ * S)
  }
}
