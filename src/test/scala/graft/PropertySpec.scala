package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexParams, SubIndexGraph}
import graft.operators.TopKBuffer

/** ScalaCheck properties for the kernel-level pieces (SURVEY §5: exact-mode
  * equivalence, permutation invariance, bounded-heap correctness). Kernel
  * objects are exercised directly — no Spark jobs — so the generators can
  * run hundreds of cases. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-10.0f, 10.0f))

  private def buildGraph(vecs: Seq[Array[Float]], m: Int = 4): SubIndexGraph = {
    val g = new SubIndexGraph(
      IndexParams(minimumConnect = m, relaxedMonotonicity = 8, step = 2), vecs.length)
    vecs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
    g
  }

  test("TopKBuffer equals sort-take-k for any input and any k") {
    check(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 1000L))),
      Gen.chooseNum(1, 20)) { (xs: List[(Double, Long)], k: Int) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (d, id) => buf.insert(d, id) }
      val want = xs.distinct.sorted.take(k)
      // buffer dedupes nothing; compare against plain sorted take
      val wantAll = xs.sorted.take(k)
      buf.sortedPairs.toList == wantAll || buf.sortedPairs.toList == want
    })
  }

  test("TopKBuffer merge is order-insensitive (partial/final equivalence)") {
    check(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L))),
      Gen.chooseNum(1, 8),
      Gen.chooseNum(0, 100)) { (xs: List[(Double, Long)], k: Int, cut: Int) =>
      val split = math.min(cut, xs.length)
      val (l, r) = xs.splitAt(split)
      val a = new TopKBuffer(k); l.foreach { case (d, id) => a.insert(d, id) }
      val b = new TopKBuffer(k); r.foreach { case (d, id) => b.insert(d, id) }
      a.merge(b)
      val one = new TopKBuffer(k); xs.foreach { case (d, id) => one.insert(d, id) }
      a.sortedPairs.toSeq == one.sortedPairs.toSeq
    })
  }

  test("exact mode (searchWidth=0 brute force) always matches naive sort") {
    check(Prop.forAll(
      Gen.chooseNum(2, 40).flatMap(n => Gen.listOfN(n, vecGen)),
      vecGen,
      Gen.chooseNum(1, 10)) { (vecs: List[Array[Float]], q: Array[Float], k: Int) =>
      val g = buildGraph(vecs)
      val got = g.bruteForceTopK(q, k).toSeq
      val want = vecs.zipWithIndex.map { case (v, i) =>
        var acc = 0.0; var j = 0
        while (j < 8) { val d = v(j).toDouble - q(j).toDouble; acc += d * d; j += 1 }
        (acc, i.toLong)
      }.sorted.take(k)
      got == want
    })
  }

  test("graph build is deterministic: same input twice -> same adjacency") {
    check(Prop.forAll(
      Gen.chooseNum(2, 30).flatMap(n => Gen.listOfN(n, vecGen))) { vecs: List[Array[Float]] =>
      val g1 = buildGraph(vecs)
      val g2 = buildGraph(vecs)
      (0 until g1.count).forall { o =>
        g1.layerOf(o) == g2.layerOf(o) &&
          g1.out(o).map(el => (0 until el.size).map(i => (el.ds(i), el.ns(i)))) ==
          g2.out(o).map(el => (0 until el.size).map(i => (el.ds(i), el.ns(i))))
      } && g1.entryOffset == g2.entryOffset && g1.layerCount == g2.layerCount
    })
  }

  test("ANN results are a subset of the corpus and ranked ascending") {
    check(Prop.forAll(
      Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, vecGen)),
      vecGen,
      Gen.chooseNum(1, 8),
      Gen.chooseNum(1, 32)) {
      (vecs: List[Array[Float]], q: Array[Float], k: Int, sw: Int) =>
        val g = buildGraph(vecs)
        val res = g.queryTopK(q, k, sw)
        res.length <= k &&
          res.forall { case (_, gid) => gid >= 0 && gid < vecs.length } &&
          res.sliding(2).forall { case Array(a, b) => a._1 <= b._1; case _ => true }
    })
  }

  test("SQ8 quantized exact search equals an independent integer brute force") {
    // vectors span [-10,10] while the quantization range is [-1,1], so the
    // clamp path is exercised; the reference below re-derives the bytes
    // and integer distances from the published formula alone
    val (lo, hi) = (-1.0, 1.0)
    def quantRef(v: Array[Float]): Array[Int] =
      v.map { x =>
        val t = math.floor((x.toDouble - lo) * (255.0 / (hi - lo)) + 0.5)
        math.max(0.0, math.min(255.0, t)).toInt
      }
    check(Prop.forAll(
      Gen.chooseNum(2, 40).flatMap(n => Gen.listOfN(n, vecGen)),
      vecGen,
      Gen.chooseNum(1, 10)) { (vecs: List[Array[Float]], q: Array[Float], k: Int) =>
      val g = new SubIndexGraph(
        IndexParams(minimumConnect = 4, relaxedMonotonicity = 8, step = 2,
          quantized = true, quantLo = lo.toFloat, quantHi = hi.toFloat), vecs.length)
      vecs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
      val got = g.bruteForceTopK(q, k).toSeq
      val qq = quantRef(q)
      val want = vecs.zipWithIndex.map { case (v, i) =>
        val qv = quantRef(v)
        (qv.zip(qq).map { case (a, b) => ((a - b) * (a - b)).toLong }.sum.toDouble, i.toLong)
      }.sorted.take(k)
      got == want
    })
  }

  test("quantized graph build is deterministic and append-stable") {
    val p = IndexParams(minimumConnect = 4, relaxedMonotonicity = 8, step = 2,
      quantized = true, quantLo = -10f, quantHi = 10f)
    check(Prop.forAll(
      Gen.chooseNum(4, 30).flatMap(n => Gen.listOfN(n, vecGen))) { vecs: List[Array[Float]] =>
      def build(vs: Seq[Array[Float]]): SubIndexGraph = {
        val g = new SubIndexGraph(p, vs.length)
        vs.zipWithIndex.foreach { case (v, i) => g.insert(i.toLong, v) }
        g
      }
      val g1 = build(vecs)
      val g2 = build(vecs)
      (0 until g1.count).forall { o =>
        g1.layerOf(o) == g2.layerOf(o) && g1.vecAt(o).sameElements(g2.vecAt(o)) &&
          g1.out(o).map(el => (0 until el.size).map(i => (el.ds(i), el.ns(i)))) ==
          g2.out(o).map(el => (0 until el.size).map(i => (el.ds(i), el.ns(i))))
      } && g1.entryOffset == g2.entryOffset
    })
  }

  test("SortedPairs emits exactly the i<j pairs of a sorted array") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 50L))) { xs: List[Long] =>
      val sorted = xs.distinct.sorted
      val gen = graft.functions.SortedPairs(
        BoundReference(0, ArrayType(LongType, containsNull = false), nullable = false))
      val row = InternalRow(new GenericArrayData(sorted.toArray))
      val got = gen.eval(row).iterator.toList.map(r => (r.getLong(0), r.getLong(1)))
      val want = for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
      got == want.toList
    })
  }

  test("SpaceSavingBuffer: exact below capacity; overestimate bounded above it") {
    import graft.operators.SpaceSavingBuffer
    val streamGen = Gen.listOf(Gen.chooseNum(0, 40).map(i => s"k$i"))
    check(Prop.forAll(streamGen, Gen.chooseNum(4, 64)) { (xs: List[String], cap: Int) =>
      val buf = new SpaceSavingBuffer(cap)
      xs.foreach(buf.add(_, 1L, 0L))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val entries = buf.sortedEntries
      val sizeOk = entries.length <= cap
      val boundOk = entries.forall { case (k, n, err) =>
        val t = truth.getOrElse(k, 0L)
        n >= t && n - err <= t // count overestimates, never underestimates
      }
      val exactOk = truth.size > cap || entries.forall { case (k, n, err) =>
        err == 0L && n == truth(k)
      }
      sizeOk && boundOk && exactOk
    })
  }

  test("SpaceSavingBuffer: any merge tree equals single-buffer ingestion (exact regime)") {
    import graft.operators.SpaceSavingBuffer
    val streamGen = Gen.listOf(Gen.chooseNum(0, 30).map(i => s"k$i"))
    check(Prop.forAll(streamGen, Gen.chooseNum(1, 5)) { (xs: List[String], parts: Int) =>
      val cap = 64 // > 31 distinct keys: exact regime
      val chunks = if (xs.isEmpty) List(xs) else xs.grouped(
        math.max(1, xs.length / parts)).toList
      val merged = chunks.map { c =>
        val b = new SpaceSavingBuffer(cap); c.foreach(b.add(_, 1L, 0L)); b
      }.reduceLeft { (a, b) => a.merge(b); a }
      val one = new SpaceSavingBuffer(cap)
      xs.foreach(one.add(_, 1L, 0L))
      merged.sortedEntries.toSeq == one.sortedEntries.toSeq
    })
  }
}
