package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{EdgeList, IndexParams, SubIndexGraph}

/** Kernel-internal adjacency invariants, exercised hard enough that the
  * prune path runs against out-lists grown past M by connectivity repair
  * (the removeAt regression: evicting the physically-last entry instead of
  * the recorded index-M entry desyncs out/edges refcounts). */
class KernelInvariantSpec extends AnyFunSuite {

  test("EdgeList.removeAt removes the indexed entry and keeps order") {
    val el = new EdgeList(4)
    el.insert(3.0, 30); el.insert(1.0, 10); el.insert(2.0, 20); el.insert(4.0, 40)
    el.removeAt(1) // removes (2.0, 20)
    assert(el.size === 3)
    assert((0 until el.size).map(i => (el.ds(i), el.ns(i))) ===
      Seq((1.0, 10), (3.0, 30), (4.0, 40)))
    el.removeAt(2) // removes the last entry
    assert((0 until el.size).map(i => (el.ds(i), el.ns(i))) ===
      Seq((1.0, 10), (3.0, 30)))
  }

  /** Deterministic LCG vectors; low M + tight cluster structure forces many
    * prune evictions and repairs. */
  private def buildGraph(n: Int, dim: Int, m: Int): SubIndexGraph = {
    var seed = 42L
    def next(): Float = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33).toInt % 1000) / 500.0f
    }
    val g = new SubIndexGraph(IndexParams(minimumConnect = m,
      relaxedMonotonicity = 16, step = 2), n)
    (0 until n).foreach { i => g.insert(i.toLong, Array.fill(dim)(next())) }
    g
  }

  test("out/edges refcounts stay consistent under prune + repair") {
    val g = buildGraph(n = 600, dim = 8, m = 3)
    var checkedEdges = 0
    for (x <- 0 until g.count; layer <- 0 to g.layerOf(x)) {
      val adj = g.edges(x)(layer)
      for (ai <- 0 until adj.size) {
        val n = adj.nbrs(ai)
        val rc = adj.rcs(ai)
        // symmetry: the reverse undirected entry exists with the same rc
        val back = g.edges(n)(layer)
        val bi = back.indexOf(x)
        assert(bi >= 0, s"edges($x)($layer) -> $n has no reverse entry")
        assert(back.rcs(bi) === rc, s"asymmetric rc for ($x,$n) layer $layer")
        // rc == number of directed out-edges between the pair (1..2)
        def hasOut(a: Int, b: Int): Boolean = {
          val el = g.out(a)(layer)
          (0 until el.size).exists(el.ns(_) == b)
        }
        val directed = (if (hasOut(x, n)) 1 else 0) + (if (hasOut(n, x)) 1 else 0)
        assert(rc === directed,
          s"rc=$rc but $directed directed edges between ($x,$n) layer $layer")
        checkedEdges += 1
      }
    }
    assert(checkedEdges > 0)
    // every out-edge must be navigable through the undirected adjacency
    for (x <- 0 until g.count; layer <- 0 to g.layerOf(x)) {
      val el = g.out(x)(layer)
      for (i <- 0 until el.size)
        assert(g.edges(x)(layer).indexOf(el.ns(i)) >= 0,
          s"out edge $x->${el.ns(i)} missing from edges, layer $layer")
    }
  }

  test("layer-0 graph is fully connected (repair keeps exact mode exhaustive)") {
    val g = buildGraph(n = 600, dim = 8, m = 3)
    val seen = new Array[Boolean](g.count)
    var stack = List(g.entryOffset)
    seen(g.entryOffset) = true
    var reached = 1
    while (stack.nonEmpty) {
      val cur = stack.head; stack = stack.tail
      val adj = g.edges(cur)(0)
      for (ai <- 0 until adj.size) {
        val n = adj.nbrs(ai)
        if (!seen(n)) { seen(n) = true; reached += 1; stack = n :: stack }
      }
    }
    assert(reached === g.count, s"layer-0 graph disconnected: $reached of ${g.count}")
  }
}
