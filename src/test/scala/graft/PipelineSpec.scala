package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Sessionize}

class PipelineSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  test("exactDedup groups identical texts and keeps the min id") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (7L, "x y"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val r = Dedup.exactDedup(docs).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(r === Set((1L, 3L), (7L, 1L)))
  }

  test("ngramJaccardPairs finds near-identical docs and skips unrelated ones") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),          // near-dup of 1
      (3L, "completely different words with no shared trigrams at all ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("minHash LSH candidates include exact duplicates") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatePairs(docs, n = 3, numHashes = 6, bandSize = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simHash: identical texts share fingerprints, disjoint texts differ") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated content goes right here"))
      .toDF("doc_id", "text")
    val fp = Dedup.simHash(docs).as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("sessionize splits on gaps > threshold and aggregates correctly") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 1.0), (1L, 3L, ts(70), 1.0),
      (2L, 4L, ts(5), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val sessions = Sessionize.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events").as[(Long, Int, Long)].collect()
    assert(sessions.toSeq === Seq((1L, 0, 2L), (1L, 1, 1L), (2L, 0, 1L)))
  }

  test("ngramJaccardPairs df-cap: no-op above max df, prunes below") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingled(docs, 3)
    val uncapped = Dedup.ngramJaccardPairsFromShingles(sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cappedHigh = Dedup.ngramJaccardPairsFromShingles(sh, 0.8, maxShingleDf = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cappedHigh === uncapped)
    assert(uncapped === Set((1L, 2L)))
    // cap of 1 drops every shared shingle -> no pairs survive
    val capped1 = Dedup.ngramJaccardPairsFromShingles(sh, 0.8, maxShingleDf = 1)
      .collect()
    assert(capped1.isEmpty)
  }

  test("sessionize orders fractional-second events correctly (sort-key regression)") {
    // 1.6s and 2.0s: the old key getTime*1000 + nanos/1000 double-counted
    // the sub-second part (1.6s -> 2,200,000 us), ordering the earlier
    // event AFTER the later one — visible as start_ts > end_ts
    def ts(ms: Long) = new Timestamp(1700000000000L + ms)
    val events = Seq(
      (1L, 1L, ts(1600), 1.0), (1L, 2L, ts(2000), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val s = Sessionize.sessionize(events, gapMinutes = 30)
      .select("start_ts", "end_ts").as[(Timestamp, Timestamp)].head()
    assert(s._1 === ts(1600))
    assert(s._2 === ts(2000))
  }

  test("multimodal payload round-trip: features computed from real bytes") {
    val docs = Seq((1L, "héllo wörld")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(Multimodal.withPayload(docs)).head
    assert(f.getLong(1) === "héllo wörld".getBytes("UTF-8").length.toLong)
    assert(f.getString(2).length === 64) // sha256 hex
  }
}
