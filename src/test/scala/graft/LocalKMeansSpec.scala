package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.LocalKMeans

/** Invariants of the shared driver-side trainer: determinism, assign =
  * argmin, separation of well-separated clusters, degenerate inputs. */
class LocalKMeansSpec extends AnyFunSuite {

  private def cluster(center: Array[Float], n: Int, spread: Float, seed: Int) = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(center.zipWithIndex.map { case (c, _) =>
      c + (r.nextFloat() - 0.5f) * spread })
  }

  test("training is deterministic: same input + seed, same centroids") {
    val pts = cluster(Array(0f, 0f), 50, 1f, 1) ++ cluster(Array(10f, 10f), 50, 1f, 2)
    val a = LocalKMeans.train(pts, 4, 5, 42L)
    val b = LocalKMeans.train(pts, 4, 5, 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("well-separated clusters end up in different cells") {
    val c1 = cluster(Array(0f, 0f), 40, 0.5f, 3)
    val c2 = cluster(Array(100f, 100f), 40, 0.5f, 4)
    val cents = LocalKMeans.train(c1 ++ c2, 2, 5, 7L)
    val a1 = c1.map(LocalKMeans.assign(cents, _)).toSet
    val a2 = c2.map(LocalKMeans.assign(cents, _)).toSet
    assert(a1.size == 1 && a2.size == 1 && a1 != a2,
      s"separated clusters must map to distinct cells: $a1 vs $a2")
  }

  test("assign returns the argmin centroid (ties to lowest index)") {
    val cents = Array(Array(0f, 0f), Array(4f, 0f), Array(0f, 4f))
    assert(LocalKMeans.assign(cents, Array(0.1f, 0.1f)) == 0)
    assert(LocalKMeans.assign(cents, Array(3.9f, 0f)) == 1)
    assert(LocalKMeans.assign(cents, Array(0f, 5f)) == 2)
    // exact midpoint between centroids 0 and 1: lowest index wins
    assert(LocalKMeans.assign(cents, Array(2f, 0f)) == 0)
  }

  test("degenerate input: all points identical still yields k centroids") {
    val pts = Array.fill(20)(Array(1f, 2f, 3f))
    val cents = LocalKMeans.train(pts, 4, 3, 11L)
    assert(cents.length == 4)
    cents.foreach(c => assert(c.toSeq == Seq(1f, 2f, 3f)))
  }

  test("fewer points than k is rejected") {
    assertThrows[IllegalArgumentException] {
      LocalKMeans.train(Array(Array(1f)), 2, 1, 1L)
    }
  }
}
