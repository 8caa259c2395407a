package graft.index

import scala.collection.mutable

import graft.functions.DistanceMetric

/** Index build/search parameters — the engine-side `Index_Parameters`
  * (reference: source/dehnsw.h:72-95).
  *
  * @param metric distance metric (all three enabled, unlike the reference's
  *               Euclidean2-only dispatch, source/distance.h:178-186)
  * @param minimumConnect       target out-degree M per node (dehnsw.h:86)
  * @param relaxedMonotonicity  build-time early-termination window (dehnsw.h:84)
  * @param step                 BFS radius for deterministic layer promotion (dehnsw.h:76)
  * @param subIndexBound        max vectors per shard (dehnsw.h:80)
  */
case class IndexParams(
    metric: DistanceMetric = DistanceMetric.Euclidean2,
    minimumConnect: Int = 4,
    relaxedMonotonicity: Int = 128,
    step: Int = 4,
    subIndexBound: Long = 10000000L)

/** One shard's graph — the engine-side `Sub_Index` (reference:
  * source/dehnsw.h:54-70), built partition-locally inside `mapPartitions`.
  *
  * Semantics preserved from the reference build kernel (SURVEY §2.1 O2-O5):
  * M-nearest linking, undirected refcounted edges, degree-cap pruning with
  * farthest eviction, bounded-BFS connectivity repair, and deterministic
  * step-BFS layer promotion (no RNG — rebuilds are reproducible).
  * Deliberate divergences: distances accumulate in Double (not float32),
  * and ties order by (distance, offset) instead of multimap insertion
  * order — both deterministic.
  */
final class SubIndexGraph(params: IndexParams, capacity: Int) extends Serializable {

  var count: Int = 0
  var layerCount: Int = 0
  /** Entry point — `vector_in_highest_layer` (reference: dehnsw.h:62). */
  var entryOffset: Int = 0

  val globalIds = new Array[Long](capacity)
  val data = new Array[Array[Float]](capacity)
  val layerOf = new Array[Int](capacity)
  /** Per vector, per layer: directed out-edges sorted by (dist, nbr) —
    * the pruning order (reference: dehnsw.h:41,441-442). */
  val out = new Array[mutable.ArrayBuffer[mutable.TreeSet[(Double, Int)]]](capacity)
  /** Per vector, per layer: undirected adjacency, nbr -> refcount 1..2
    * (reference: dehnsw.h:43; traversal walks these, not `out`). */
  val edges = new Array[mutable.ArrayBuffer[mutable.HashMap[Int, Int]]](capacity)

  @inline private def dist(a: Array[Float], b: Array[Float]): Double = params.metric match {
    case DistanceMetric.Euclidean2 =>
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    case DistanceMetric.InnerProduct =>
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      1.0 - acc
    case DistanceMetric.Cosine =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Insert in offset order — `insert` (reference: dehnsw.h:590-663). The
    * first vector of a shard is stored without edges (dehnsw.h:601-609). */
  def insert(globalId: Long, vec: Array[Float]): Unit = {
    val offset = count
    globalIds(offset) = globalId
    data(offset) = vec
    layerOf(offset) = 0
    out(offset) = mutable.ArrayBuffer(mutable.TreeSet.empty[(Double, Int)])
    edges(offset) = mutable.ArrayBuffer(mutable.HashMap.empty[Int, Int])
    count += 1
    if (offset > 0) add(offset)
  }

  /** Graph insert — `add` (reference: dehnsw.h:403-509). */
  private def add(offset: Int): Unit = {
    val vec = data(offset)
    // descend from the entry point, stacking per-layer candidate sets
    // (reference: dehnsw.h:406-417)
    val stack = mutable.Stack.empty[mutable.TreeSet[(Double, Int)]]
    stack.push(nnInsert(layerCount, vec, entryOffset))
    var ln = layerCount - 1
    while (ln >= 0) {
      stack.push(nnInsert(ln, vec, stack.top.head._2))
      ln -= 1
    }
    var targetLayer = 0
    var continue = true
    while (continue && stack.nonEmpty) {
      // evicted-target -> (dist, pruning neighbor) (reference: dehnsw.h:421)
      val deletedEdges = mutable.HashMap.empty[Int, (Double, Int)]
      val candidates = stack.top
      out(offset)(targetLayer) = candidates
      for ((_, nbr) <- candidates) edges(offset)(targetLayer).update(nbr, 1)
      for ((d, nbr) <- candidates) {
        val nOut = out(nbr)(targetLayer)
        val nEdges = edges(nbr)(targetLayer)
        nEdges.getOrElseUpdate(offset, 0)
        nEdges(offset) = math.max(nEdges(offset), 1)
        if (nOut.size < params.minimumConnect) {
          // both directed edges exist -> refcount 2 (reference: dehnsw.h:433-438)
          nOut.add((d, offset))
          nEdges(offset) = nEdges(offset) + 1
          edges(offset)(targetLayer)(nbr) = edges(offset)(targetLayer)(nbr) + 1
        } else {
          // prune: keep neighbor's M best, evict the (M+1)-th
          // (reference: dehnsw.h:440-464)
          val mth = nOut.iterator.drop(params.minimumConnect - 1).next()
          if (d < mth._1) {
            nOut.add((d, offset))
            nEdges(offset) = nEdges(offset) + 1
            edges(offset)(targetLayer)(nbr) = edges(offset)(targetLayer)(nbr) + 1
            val evicted = nOut.iterator.drop(params.minimumConnect).next()
            val target = evicted._2
            if (!deletedEdges.contains(target)) deletedEdges(target) = (evicted._1, nbr)
            decRef(nbr, target, targetLayer)
            decRef(target, nbr, targetLayer)
            nOut.remove(evicted)
          }
        }
      }
      // connectivity repair (reference: dehnsw.h:467-489)
      if (!connected(targetLayer, offset, deletedEdges)) {
        for ((target, (d, nbr)) <- deletedEdges) {
          out(nbr)(targetLayer).add((d, target))
          incRef(nbr, target, targetLayer)
          incRef(target, nbr, targetLayer)
        }
      }
      // deterministic promotion (reference: dehnsw.h:491-507)
      if (insertToUpperLayer(targetLayer, offset)) {
        stack.pop()
        targetLayer += 1
        if (layerCount < targetLayer) {
          layerCount = targetLayer
          entryOffset = offset
        }
        layerOf(offset) += 1
        out(offset) += mutable.TreeSet.empty[(Double, Int)]
        edges(offset) += mutable.HashMap.empty[Int, Int]
      } else {
        continue = false
      }
    }
  }

  @inline private def decRef(from: Int, to: Int, layer: Int): Unit = {
    val m = edges(from)(layer)
    m.get(to) match {
      case Some(1)  => m.remove(to)
      case Some(rc) => m(to) = rc - 1
      case None     =>
    }
  }

  @inline private def incRef(from: Int, to: Int, layer: Int): Unit = {
    val m = edges(from)(layer)
    m(to) = m.getOrElse(to, 0) + 1
  }

  /** Bounded reachability check — `connected` (reference: dehnsw.h:119-148):
    * BFS <= 4 rounds from `start`; evicted edges whose far endpoint is
    * reached are safe; returns false if any stay unreached. */
  private def connected(
      layer: Int, start: Int, deletedEdges: mutable.HashMap[Int, (Double, Int)]): Boolean = {
    if (deletedEdges.isEmpty) return true
    var last = mutable.HashSet(start)
    var next = mutable.HashSet.empty[Int]
    val flag = mutable.HashSet(start)
    var round = 0
    while (round < 4) {
      for (v <- last; nbr <- edges(v)(layer).keysIterator) {
        if (flag.add(nbr)) {
          deletedEdges.remove(nbr)
          next.add(nbr)
        }
      }
      if (deletedEdges.isEmpty) return true
      val t = last; last = next; next = t; next.clear()
      round += 1
    }
    false
  }

  /** Deterministic promotion test — `insert_to_upper_layer` (reference:
    * dehnsw.h:150-178): BFS <= step rounds on `layer`; promote only if the
    * ball contains no vector already on a higher layer. */
  private def insertToUpperLayer(layer: Int, offset: Int): Boolean = {
    var last = mutable.HashSet(offset)
    var next = mutable.HashSet.empty[Int]
    val flag = mutable.HashSet(offset)
    var round = 0
    while (round < params.step) {
      for (v <- last; nbr <- edges(v)(layer).keysIterator) {
        if (flag.add(nbr)) {
          if (layer < layerOf(nbr)) return false
          next.add(nbr)
        }
      }
      val t = last; last = next; next = t; next.clear()
      round += 1
    }
    true
  }

  /** Build-time beam search — `nearest_neighbors_insert` (reference:
    * dehnsw.h:181-237): best-first over edges(layer), keeps the M best,
    * early-stops after `relaxedMonotonicity` consecutive non-improving
    * pops (RM counter semantics: starts at 1, `==` test, dehnsw.h:215). */
  private def nnInsert(layer: Int, q: Array[Float], start: Int): mutable.TreeSet[(Double, Int)] = {
    val result = mutable.TreeSet.empty[(Double, Int)]
    val flags = mutable.HashSet.empty[Int]
    var outOfBound = 1
    val waiting = mutable.TreeSet((dist(q, data(start)), start))
    var break = false
    while (!break && waiting.nonEmpty) {
      val processing @ (d, v) = waiting.head
      waiting.remove(processing)
      flags.add(v)
      if (result.size < params.minimumConnect) {
        result.add((d, v))
      } else if (d <= result.last._1) {
        outOfBound = 1
        result.add((d, v))
        result.remove(result.last)
      } else if (params.relaxedMonotonicity == outOfBound) {
        break = true
      } else {
        outOfBound += 1
      }
      if (!break) {
        for (nbr <- edges(v)(layer).keysIterator) {
          if (flags.add(nbr)) waiting.add((dist(q, data(nbr)), nbr))
        }
      }
    }
    result
  }

  /** Exact per-shard top-k by full scan — the searchWidth=0 path. The
    * reference's RM=0 semantics is an exhaustive walk of the layer-0
    * connected component (dehnsw.h:300-307); a full scan is the same cost
    * O(shard size) but guaranteed exact even if pruning ever disconnects
    * the graph, so exact mode is a true brute-force oracle. */
  def bruteForceTopK(q: Array[Float], k: Int): Array[(Double, Long)] = {
    val result = mutable.TreeSet.empty[(Double, Long)]
    var i = 0
    while (i < count) {
      val d = dist(q, data(i))
      val gid = globalIds(i)
      if (result.size < k) result.add((d, gid))
      else {
        val worst = result.last
        if (d < worst._1 || (d == worst._1 && gid < worst._2)) {
          result.remove(worst)
          result.add((d, gid))
        }
      }
      i += 1
    }
    result.toArray
  }

  /** Query kernel — `nearest_neighbors_query` (reference: dehnsw.h:241-323).
    * Phase 1: greedy hill-climb through layers layerCount-1..1; phase 2:
    * best-first beam on layer 0 with a k-bounded worst-first set.
    * `searchWidth` (=query RM): 0 never triggers the early stop (counter
    * starts at 1, dehnsw.h:300-307) => exhaustive over the connected
    * component = exact search. Returns ascending (distance, globalId). */
  def queryTopK(q: Array[Float], k: Int, searchWidth: Int): Array[(Double, Long)] = {
    if (count == 0) return Array.empty
    val flags = new Array[Boolean](count)
    // worst-first bounded result (max at head semantics via TreeSet.last)
    val result = mutable.TreeSet.empty[(Double, Long)]
    var outOfBound = 1
    val waiting = mutable.TreeSet((dist(q, data(entryOffset)), entryOffset))
    flags(entryOffset) = true
    // phase 1 (reference: dehnsw.h:258-279)
    var layer = layerCount - 1
    while (layer >= 1) {
      var climbing = true
      while (climbing) {
        val cur = waiting.head._2
        for (nbr <- edges(cur)(layer).keysIterator) {
          if (!flags(nbr)) {
            flags(nbr) = true
            waiting.add((dist(q, data(nbr)), nbr))
          }
        }
        if (cur == waiting.head._2) climbing = false
      }
      layer -= 1
    }
    // phase 2 (reference: dehnsw.h:280-321)
    var break = false
    while (!break && waiting.nonEmpty) {
      val processing @ (d, v) = waiting.head
      waiting.remove(processing)
      if (result.size < k) {
        result.add((d, globalIds(v)))
      } else if (d < result.last._1) {
        outOfBound = 1
        result.remove(result.last)
        result.add((d, globalIds(v)))
      } else if (searchWidth == outOfBound) {
        break = true
      } else {
        outOfBound += 1
      }
      if (!break) {
        for (nbr <- edges(v)(0).keysIterator) {
          if (!flags(nbr)) {
            flags(nbr) = true
            waiting.add((dist(q, data(nbr)), nbr))
          }
        }
      }
    }
    result.toArray
  }
}
