package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bloom, BloomMightContainLong}
import graft.operators.Dedup

/** Bloom filter summary (functions/Bloom.scala) + the Bloom-prefiltered
  * contamination screen (d13): no false negatives ever, bounded false
  * positives, interpreted/codegen parity, and exactness of the composed
  * operator against the unfiltered one. */
class BloomSpec extends AnyFunSuite with SparkSuite {

  private def buildLocal(hashes: Seq[Long], nbits: Int, k: Int): Array[Long] = {
    import spark.implicits._
    Bloom.build(hashes.toDF("h"), nbits, k)
  }

  test("no false negatives: every inserted hash tests true (property)") {
    // pure-local property (no Spark round trip per case): insert via the
    // same probe scheme build uses, then assert membership
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.long)) { xs =>
      val bits = new Array[Long](1 << 4)
      xs.foreach { h =>
        val z = Bloom.mix(h)
        val h2 = (z >>> 32) | 1L
        (0 until 3).foreach { i =>
          val idx = ((z + i.toLong * h2) & (bits.length * 64 - 1)).toInt
          bits(idx >>> 6) |= 1L << (idx & 63)
        }
      }
      xs.forall { x =>
        BloomMightContainLong(
          org.apache.spark.sql.catalyst.expressions.Literal(x), bits, 3).eval(null)
          .asInstanceOf[Boolean]
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed build inserts exactly the probe-scheme bits (spark == local)") {
    val xs = (1L to 2000L).map(_ * 0x9E3779B97F4A7C15L + 17)
    val viaSpark = buildLocal(xs, nbits = 1 << 10, k = 3)
    val local = new Array[Long](1 << 4)
    xs.foreach { h =>
      val z = Bloom.mix(h)
      val h2 = (z >>> 32) | 1L
      (0 until 3).foreach { i =>
        val idx = ((z + i.toLong * h2) & (local.length * 64 - 1)).toInt
        local(idx >>> 6) |= 1L << (idx & 63)
      }
    }
    assert(java.util.Arrays.equals(viaSpark, local))
  }

  test("false-positive rate is bounded on disjoint probes") {
    val rnd = new scala.util.Random(7)
    val inserted = Seq.fill(1000)(rnd.nextLong())
    val bits = buildLocal(inserted, nbits = 1 << 14, k = 3)
    val insertedSet = inserted.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(insertedSet).take(10000).toSeq
    val fp = probes.count { x =>
      BloomMightContainLong(
        org.apache.spark.sql.catalyst.expressions.Literal(x), bits, 3).eval(null)
        .asInstanceOf[Boolean]
    }
    // m/n = 16.4 bits/key, k=3 → theoretical fp ≈ 0.5%; assert ~4x slack
    // so the gate never flakes (the pre-mixing bug measured 5.8% here)
    assert(fp < 200, s"false-positive count $fp / 10000 out of bounds")
  }

  test("codegen path agrees with interpreted eval through a DataFrame filter") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val inserted = Seq.fill(500)(rnd.nextLong())
    val bits = buildLocal(inserted, nbits = 1 << 12, k = 4)
    val universe = (inserted ++ Seq.fill(2000)(rnd.nextLong())).distinct
    val viaDf = universe.toDF("h")
      .filter(Bloom.mightContain(col("h"), bits, 4))
      .collect().map(_.getLong(0)).toSet
    val viaEval = universe.filter { x =>
      BloomMightContainLong(
        org.apache.spark.sql.catalyst.expressions.Literal(x), bits, 4).eval(null)
        .asInstanceOf[Boolean]
    }.toSet
    assert(viaDf === viaEval)
    assert(inserted.forall(viaDf), "codegen probe dropped an inserted hash")
  }

  test("bitset is row-order and partitioning invariant") {
    import spark.implicits._
    val xs = (1L to 5000L).map(_ * 2654435761L)
    val a = Bloom.build(xs.toDF("h").repartition(7), 1 << 12, 3)
    val b = Bloom.build(xs.reverse.toDF("h").repartition(2), 1 << 12, 3)
    assert(java.util.Arrays.equals(a, b))
  }

  test("d13: bloom-prefiltered contamination == unfiltered exact operator") {
    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(col("doc_id") % 10 =!= 3)
    val eval = docs.filter(col("doc_id") % 10 === 3)
    val exact = Dedup.contaminationPairs(train, eval, n = 6)
      .orderBy(col("train_id"), col("eval_id")).collect().map(_.toSeq)
    // tiny bitset (forced false positives) must change NOTHING — the
    // confirm join owns exactness, nbits only tunes cost
    for (nbits <- Seq(1 << 8, 1 << 18)) {
      val bloomed = Dedup.contaminationPairsBloom(train, eval, n = 6, nbits = nbits)
        .orderBy(col("train_id"), col("eval_id")).collect().map(_.toSeq)
      assert(bloomed.toSeq === exact.toSeq, s"nbits=$nbits diverged")
    }
    assert(exact.nonEmpty, "fixture produced no contaminated pairs — gate is vacuous")
  }

  test("prefilter keeps the plan shape: no eval-gram broadcast before the map-side filter") {
    // the bloom filter must appear as a Filter on the train side BEFORE
    // the distinct aggregation — i.e. the explode feeds the bloom probe
    // directly (map-side), not an Exchange
    val docs = Tables.documents(spark, sfDir)
    val df = Dedup.contaminationPairsBloom(
      docs.filter(col("doc_id") % 10 =!= 3),
      docs.filter(col("doc_id") % 10 === 3), n = 6, nbits = 1 << 12)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from physical plan:\n$plan")
  }
}
