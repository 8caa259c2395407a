package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Expression, IntegerLiteral,
  Literal, NamedExpression, SortOrder, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{
  CosineDistance, DistanceMetric, InnerProductDistance, SquaredL2Distance}
import graft.index.{AnnProbe, VectorIndex}

/** Registry binding a built [[VectorIndex]] to the corpus plan it indexes —
  * the engine-side "CREATE INDEX" catalog that [[AnnTopKRewrite]] consults.
  *
  * The corpus DataFrame must expose (id LONG, embedding ARRAY<FLOAT>)
  * columns (same contract as VectorIndex.build). Matching inside the
  * optimizer is structural (`sameResult` on canonicalized plans), so a
  * query is accelerated when its FROM subtree is the registered
  * computation — the same frame reused, or an equivalent plan.
  */
object IndexCatalog {

  /** idPos/embPos: positions of the id/embedding columns in `plan.output`.
    * `stripped` is the plan under a top alias-only Project (the optimizer
    * collapses adjacent Projects, so the matched subtree usually surfaces
    * WITHOUT the registration-time Project on top), with the id/embedding
    * positions mapped through to the child's output. */
  private case class Entry(
      index: AnnProbe,
      plan: LogicalPlan, idPos: Int, embPos: Int,
      stripped: Option[(LogicalPlan, Int, Int)])

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[Entry]()

  def clear(): Unit = entries.clear()

  /** Register `index` as covering `corpus` (columns id, embedding).
    * Accepts any [[AnnProbe]] — a sealed [[VectorIndex]] or a live
    * [[graft.index.LsmVectorIndex]] generation state (re-register after
    * ingest/compaction: the registration covers the corpus AS OF the
    * probe's identity). */
  def register(index: AnnProbe, corpus: DataFrame): Unit = {
    val plan = GraftSqlBridge.logicalPlan(corpus)
    // use the session-optimized form: that is the shape subtrees have when
    // the rewrite rule (an optimizer batch) sees them
    val optimized = corpus.queryExecution.optimizedPlan
    val idPos = optimized.output.indexWhere(_.name == "id")
    val embPos = optimized.output.indexWhere(_.name == "embedding")
    require(idPos >= 0 && embPos >= 0,
      s"corpus must have id and embedding columns, got ${plan.output.map(_.name)}")
    val stripped = optimized match {
      case Project(projList, child) =>
        // only an alias-only projection can be stripped losslessly
        def source(ne: NamedExpression): Option[Attribute] = ne match {
          case a: AttributeReference => Some(a)
          case Alias(a: AttributeReference, _) => Some(a)
          case _ => None
        }
        for {
          idSrc <- source(projList(idPos))
          embSrc <- source(projList(embPos))
          idChildPos = child.output.indexWhere(_.exprId == idSrc.exprId)
          embChildPos = child.output.indexWhere(_.exprId == embSrc.exprId)
          if idChildPos >= 0 && embChildPos >= 0
        } yield (child, idChildPos, embChildPos)
      case _ => None
    }
    entries.add(Entry(index, optimized, idPos, embPos, stripped))
  }

  /** Find an index whose registered corpus computes the same result as
    * `plan`; returns (index, idAttr, embAttr) in `plan`'s own attributes.
    * Entries whose owning SparkSession has been stopped are dropped — a
    * structurally-identical query from a NEW session must fall back to the
    * sort plan, not splice a probe bound to a dead SparkContext. */
  private[plans] def lookup(plan: LogicalPlan,
      ok: AnnProbe => Boolean = _ => true): Option[(AnnProbe, Attribute, Attribute)] = {
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.index.probeSession.sparkContext.isStopped) {
        entries.remove(e)
      } else if (ok(e.index)) {
        // `ok` first: several indexes may cover the SAME corpus (raw-L2 +
        // cosine + MIPS) — the caller filters by the metric it must serve
        if (e.plan.sameResult(plan)) {
          return Some((e.index, plan.output(e.idPos), plan.output(e.embPos)))
        }
        e.stripped match {
          case Some((inner, idPos, embPos)) if inner.sameResult(plan) =>
            return Some((e.index, plan.output(idPos), plan.output(embPos)))
          case _ =>
        }
      }
    }
    None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** [[lookup]] modulo EXTRA filter conjuncts: matches a plan whose top
    * Filter is a registered corpus's filter PLUS residual predicates —
    * the shape the optimizer produces when a user filters an indexed
    * corpus further (predicate pushdown merges the user's WHERE into the
    * corpus's own Filter, so an exact sameResult can never see it). The
    * residual stays IN the returned plan: the caller uses `plan` itself
    * as the pre-filtered scan, so any predicate — id ranges, metadata
    * columns — works without this code ever interpreting it. Positions
    * stay valid because Filter preserves its child's output. */
  private[plans] def lookupFiltered(plan: LogicalPlan,
      ok: AnnProbe => Boolean = _ => true): Option[(AnnProbe, Attribute, Attribute)] =
    plan match {
      case Filter(cond, src) =>
        val cs = splitConjuncts(cond)
        if (cs.length < 1 || cs.length > 6) return None // bounded subset search
        val it = entries.iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.index.probeSession.sparkContext.isStopped) {
            entries.remove(e)
          } else if (ok(e.index)) {
            val targets = (e.plan, e.idPos, e.embPos) +: e.stripped.toSeq
            // drop every nonempty conjunct subset, smallest residual
            // first; a hit means the remainder IS the registered filter
            var dropCount = 1
            while (dropCount <= cs.length) {
              for (dropped <- cs.combinations(dropCount)) {
                val kept = cs.filterNot(c => dropped.exists(_ eq c))
                val candidate = if (kept.isEmpty) src else Filter(kept.reduce(And), src)
                for ((target, idPos, embPos) <- targets)
                  if (target.sameResult(candidate))
                    return Some((e.index, plan.output(idPos), plan.output(embPos)))
              }
              dropCount += 1
            }
          }
        }
        None
      case _ => None
    }
}

/** Optimizer rewrite: `ORDER BY vec_distance(embedding, <literal>) LIMIT k`
  * over an indexed corpus becomes a [[VectorIndex]] probe — the engine-side
  * analog of an index scan replacing a sort (SURVEY §7.2's planned v2 rule;
  * reference capability: top-k query, source/dehnsw.h:512-529).
  *
  * Fires only when:
  *  - the plan is GlobalLimit(k, LocalLimit, Sort(global)) over a Project
  *    of a corpus registered in [[IndexCatalog]] (structural sameResult) —
  *    or of a registered corpus under EXTRA filter conjuncts
  *    ([[IndexCatalog.lookupFiltered]]), in which case the substitution
  *    is the fused exact top-k operator over the pre-filtered subtree
  *    (v24's shape) rather than the prebuilt-index probe;
  *  - the primary sort key is one of the engine distance expressions over
  *    the corpus's embedding column and a foldable float-array literal,
  *    with the index built for that metric;
  *  - any further sort keys are just the id column (tie-break — the probe
  *    already orders by (distance, id));
  *  - every projected column is computable from (id, distance).
  *
  * Results: with `spark.graft.ann.searchWidth` = 0 (default) the probe is
  * the per-shard exhaustive scan — bit-identical results to the sort plan,
  * pure plan substitution. Setting it > 0 opts into the ANN beam (the
  * reference's query-RM knob): sublinear probes, approximate results. A
  * trailing Sort over the k result rows keeps the output-order contract.
  *
  * TRANSFORMED indexes (cosine normalization / MIPS augmentation) serve
  * their SEMANTIC metric rank-equivalently: `ORDER BY vec_cos_dist(...)`
  * / `ORDER BY vec_ip_dist(...)` LIMIT k over a corpus registered with a
  * cosine / MIPS index rewrites too — but only when NO output column
  * exposes the distance expression (the transformed-domain distances are
  * rescaled/shifted; ids and their order are the answer). At width 0 the
  * substitution is the fused exact top-k operator computing the queried
  * metric itself (exact rows — the transformed index's own exact probe
  * ranks in float-normalized space, which can flip true near-ties);
  * width > 0 opts into the transformed index's beam.
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  private val widthConf = "spark.graft.ann.searchWidth"
  private val maxK = 10000

  /** The same logical shape is optimized repeatedly (explain, AQE,
    * re-created DataFrames), and each probe construction broadcasts the
    * query vector and runs a nested optimization — memoize the optimized
    * probe plan per (index identity, query vector, k, width). Bounded LRU
    * (index ids are unique per build, so a new session never hits a dead
    * session's entry; stale entries age out). */
  private val probeCache =
    new java.util.LinkedHashMap[(String, Seq[Float], Int, Int), LogicalPlan](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Seq[Float], Int, Int), LogicalPlan]): Boolean =
        size() > 16
    }

  private def probePlanFor(
      index: AnnProbe, qVec: Array[Float], k: Int, width: Int): LogicalPlan =
    probeCache.synchronized {
      val key = (index.probeId, qVec.toSeq, k, width)
      val hit = probeCache.get(key)
      if (hit != null) hit
      else {
        val plan = index.probeBatch(Array((0L, qVec)), k, width)
          .queryExecution.optimizedPlan
        probeCache.put(key, plan)
        plan
      }
    }

  /** Exact top-k plan for a registered corpus under RESIDUAL predicates:
    * the fused [[KnnCandidates]] operator over the filtered subtree
    * itself (the v24 pre-filter composition). Always exact — the filter
    * runs under the search, so k survivors are guaranteed and the scan
    * only reads qualifying rows. Not memoized: the key would have to
    * capture the whole filtered subtree, and residual-filtered shapes
    * repeat far less than bare probes (construction is one nested
    * optimization, no jobs). */
  private def fusedPlanFor(
      index: AnnProbe, child: LogicalPlan, idAttr: Attribute,
      embAttr: Attribute, metric: DistanceMetric, qVec: Array[Float],
      k: Int): LogicalPlan = {
    val spark = index.probeSession
    import spark.implicits._
    val qDF = Seq((0L, qVec.toSeq)).toDF("query_id", "embedding")
    val corpus = GraftSqlBridge.dataFrame(spark,
      Project(Seq(Alias(idAttr, "id")(), Alias(embAttr, "embedding")()), child))
    KnnJoinPlan.knnFused(qDF, corpus, k, metric).queryExecution.optimizedPlan
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case orig @ GlobalLimit(IntegerLiteral(k),
        LocalLimit(_, Sort(orders, true, Project(projList, child), _)))
        if k > 0 && k <= maxK && orders.nonEmpty =>
      tryRewrite(k, orders, projList, None, child).getOrElse(orig)
    // PushProjectionThroughLimit moves output projections (e.g. a final
    // round()) below the limit: Limit(Project(Sort(Project(corpus))))
    case orig @ GlobalLimit(IntegerLiteral(k),
        LocalLimit(_, Project(outer, Sort(orders, true, Project(projList, child), _))))
        if k > 0 && k <= maxK && orders.nonEmpty =>
      tryRewrite(k, orders, projList, Some(outer), child).getOrElse(orig)
  }

  private def metricOf(e: Expression): Option[(DistanceMetric, Attribute, Literal)] = {
    def sides(l: Expression, r: Expression): Option[(Attribute, Literal)] = (l, r) match {
      case (a: Attribute, lit: Literal) => Some((a, lit))
      case (lit: Literal, a: Attribute) => Some((a, lit))
      case _ => None
    }
    e match {
      case SquaredL2Distance(l, r) => sides(l, r).map { case (a, v) => (DistanceMetric.Euclidean2, a, v) }
      case InnerProductDistance(l, r) => sides(l, r).map { case (a, v) => (DistanceMetric.InnerProduct, a, v) }
      case CosineDistance(l, r) => sides(l, r).map { case (a, v) => (DistanceMetric.Cosine, a, v) }
      case _ => None
    }
  }

  private def tryRewrite(
      k: Int, orders: Seq[SortOrder], projList: Seq[NamedExpression],
      outerProj: Option[Seq[NamedExpression]],
      child: LogicalPlan): Option[LogicalPlan] = {
    // resolve sort keys and outer projections through the inner
    // projection's aliases, down to expressions over `child`'s output
    val aliasMap: Map[Attribute, Expression] =
      projList.collect { case a: Alias => (a.toAttribute: Attribute) -> a.child }.toMap
    def resolve(e: Expression): Expression = e.transformUp {
      case a: Attribute if aliasMap.contains(a) => aliasMap(a)
    }

    val head = orders.head
    if (head.direction != Ascending) return None
    val (metric, embAttr, qLit) = metricOf(resolve(head.child)) match {
      case Some(m) => m
      case None => return None
    }
    qLit.dataType match {
      case ArrayType(FloatType, _) =>
      case _ => return None
    }

    // several indexes may cover the same corpus (raw-L2 + cosine + MIPS):
    // prefer a bit-exact server for this metric, else a rank-equivalent
    // transformed one (its semantic metric matches)
    val bitExactOk = (p: AnnProbe) => p.probeMetric == metric && !p.probeNormalized
    val semanticOk = (p: AnnProbe) => p.probeSemanticMetric == metric
    val (index, idAttr, corpusEmbAttr, residualFiltered) =
      IndexCatalog.lookup(child, bitExactOk)
        .orElse(IndexCatalog.lookup(child, semanticOk)) match {
        case Some((i, a, b)) => (i, a, b, false)
        case None => IndexCatalog.lookupFiltered(child, bitExactOk)
          .orElse(IndexCatalog.lookupFiltered(child, semanticOk)) match {
          case Some((i, a, b)) => (i, a, b, true)
          case None => return None
        }
      }
    // bit-exact substitution: the raw-metric index's exact-mode probe
    // computes the very distance expression being sorted on (sequential
    // Double), so rows AND distances substitute verbatim. A transformed
    // index (cosine normalization / MIPS augmentation) probes in the
    // transformed-L2² domain: its RANKING answers the cosine /
    // inner-product ORDER BY, but its distances do not — such an index
    // may serve the query RANK-equivalently, and only when no output
    // column exposes the distance expression (checked below).
    val bitExact = bitExactOk(index)
    if (embAttr.exprId != corpusEmbAttr.exprId) return None

    // tie-break keys beyond the distance must be the id column ascending
    val tieOk = orders.tail.forall { o =>
      o.direction == Ascending && (resolve(o.child) match {
        case a: Attribute => a.exprId == idAttr.exprId
        case _ => false
      })
    }
    if (!tieOk) return None

    val distExpr = resolve(head.child)
    val qVec = qLit.value match {
      case ad: org.apache.spark.sql.catalyst.util.ArrayData => ad.toFloatArray()
      case _ => return None
    }
    val width =
      try math.max(conf.getConfString(widthConf, "0").toInt, 0)
      catch { case _: NumberFormatException => 0 }

    // the probe plan, fully optimized on its own (no jobs run here — the
    // broadcast inside the probe happens at execution time); memoized so
    // re-optimizations of the same shape reuse one plan + broadcast.
    // With residual predicates the prebuilt index cannot answer exactly
    // (post-filtering k probe rows under-delivers), so the plan becomes
    // the FUSED exact top-k custom operator over the filtered subtree —
    // v24's pre-filter shape: the predicate stays under the search, and
    // Catalyst still pushes it into the scan
    // rank-equivalent serving must not expose the transformed-domain
    // distances: bail unless every output column avoids the distance
    // expression (the common `SELECT id ... ORDER BY dist LIMIT k` shape
    // passes — column pruning has already dropped the distance from the
    // outer projection by the time this rule runs)
    if (!bitExact) {
      val exposes = outerProj.getOrElse(projList).exists { ne =>
        val e = ne match { case a: Alias => a.child; case o => o }
        resolve(e).exists(_.semanticEquals(distExpr))
      }
      if (exposes) return None
    }
    val probePlan =
      if (residualFiltered) fusedPlanFor(index, child, idAttr, corpusEmbAttr, metric, qVec, k)
      else if (!bitExact && width == 0)
        // exact face of rank-equivalent serving: the fused top-k operator
        // over the registered corpus computes the queried metric itself —
        // exact rows with no full sort (the transformed index's exact
        // probe would rank in float-normalized space, which can flip true
        // near-ties; the beam below is the explicit approximate opt-in)
        fusedPlanFor(index, child, idAttr, corpusEmbAttr, metric, qVec, k)
      else probePlanFor(index, qVec, k, width)
    val nbrAttr = probePlan.output.find(_.name == "neighbor_id").get
    val probeDistAttr = probePlan.output.find(_.name == "distance").get

    def map(e: Expression): Expression = resolve(e).transformUp {
      case x if x.semanticEquals(distExpr) => probeDistAttr
      case a: Attribute if a.exprId == idAttr.exprId => nbrAttr
    }

    // rebuild the OUTERMOST projection over probe output, keeping names
    // and exprIds so the substituted subtree binds wherever the original
    // did; bail out unless every output column is computable from
    // (id, distance)
    val probeOut = org.apache.spark.sql.catalyst.expressions.AttributeSet(probePlan.output)
    val outList = outerProj.getOrElse(projList)
    val newProj = outList.map { ne =>
      val mapped = ne match {
        case a: Alias => map(a.child)
        case other => map(other)
      }
      if (!mapped.references.subsetOf(probeOut)) return None
      Alias(mapped, ne.name)(exprId = ne.exprId)
    }
    // keep the sorted-output contract of the original Sort+Limit: sort the
    // <= k probe rows (keys over probe attrs), then project to the original
    // names/exprIds (Project preserves row order)
    val outOrders = orders.map(o => o.copy(child = map(o.child)))
    if (residualFiltered)
      logInfo(s"graft: rewrote filtered ORDER BY ${metric.name} LIMIT $k to " +
        s"fused exact top-k over the pre-filtered corpus (${index.probeDescription})")
    else if (!bitExact && width == 0)
      logInfo(s"graft: rewrote ORDER BY ${metric.name} LIMIT $k (rank-equivalent, " +
        s"ids only) to fused exact top-k over the registered corpus")
    else
      logInfo(s"graft: rewrote ORDER BY ${metric.name} LIMIT $k to index probe " +
        s"(searchWidth=$width, ${index.probeDescription}" +
        (if (!bitExact) ", rank-equivalent transformed-index beam" else "") + ")")
    Some(Project(newProj, Sort(outOrders, global = true, probePlan)))
  }
}
