package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HeavyHitters, SpaceSavingBuffer}

class HeavyHittersSpec extends AnyFunSuite with SparkSuite {

  test("SpaceSavingBuffer is exact when distinct count fits capacity") {
    val buf = new SpaceSavingBuffer(16)
    val items = Seq("a", "b", "a", "c", "a", "b", "d")
    items.foreach(buf.add(_, 1L, 0L))
    assert(buf.sortedEntries.toSeq === Seq(
      ("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L), ("d", 1L, 0L)))
  }

  test("SpaceSavingBuffer bounds memory and overestimates by at most N/capacity") {
    val buf = new SpaceSavingBuffer(8)
    // 100 distinct items, one heavy (40 occurrences of "hot")
    val stream = (1 to 100).map(i => s"x$i") ++ Seq.fill(40)("hot")
    stream.foreach(buf.add(_, 1L, 0L))
    assert(buf.sortedEntries.length <= 8)
    val hot = buf.sortedEntries.find(_._1 == "hot").get
    // count in [true, true + err], and the heavy item must survive
    assert(hot._2 >= 40L && hot._2 - hot._3 <= 40L)
  }

  test("merge equals single-buffer ingestion in the exact regime") {
    val all = (1 to 500).map(i => s"k${i % 37}")
    val (lhs, rhs) = all.splitAt(250)
    val a = new SpaceSavingBuffer(64); lhs.foreach(a.add(_, 1L, 0L))
    val b = new SpaceSavingBuffer(64); rhs.foreach(b.add(_, 1L, 0L))
    a.merge(b)
    val one = new SpaceSavingBuffer(64); all.foreach(one.add(_, 1L, 0L))
    assert(a.sortedEntries.toSeq === one.sortedEntries.toSeq)
  }

  test("topItems matches a plain groupBy count on the documents corpus") {
    import org.apache.spark.sql.Row
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val viaSketch = HeavyHitters.topItems(toks, "token", capacity = 4096, k = 10)
      .select("item", "n").collect().map { case Row(t: String, n: Long) => (t, n) }
    val exact = toks.groupBy("token").count()
      .orderBy(col("count").desc, col("token"))
      .limit(10)
      .collect().map { case Row(t: String, n: Long) => (t, n) }
    assert(viaSketch.toSeq === exact.toSeq)
  }

  test("SQL registration: heavy_hitters(item, cap, k) matches the Column form") {
    org.apache.spark.sql.graft.GraftSqlBridge.registerFunction(
      spark, "heavy_hitters", HeavyHitters.sqlBuilder)
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "").createOrReplaceTempView("hh_toks")
    val viaSql = spark.sql(
      "SELECT heavy_hitters(token, 4096, 5) AS hh FROM hh_toks")
      .select(explode(col("hh")).as("e")).select("e.item", "e.n").collect()
    val viaCol = spark.table("hh_toks")
      .agg(HeavyHitters.heavyHitters(col("token"), 4096, 5).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.item", "e.n").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("SQL form casts non-string items and rejects misuse at analysis") {
    org.apache.spark.sql.graft.GraftSqlBridge.registerFunction(
      spark, "heavy_hitters", HeavyHitters.sqlBuilder)
    // int keys: ImplicitCastInputTypes must insert the cast (previously a
    // runtime ClassCastException at execution)
    Tables.events(spark, sfDir)
      .select((col("user_id") % 7).as("key")).createOrReplaceTempView("hh_ints")
    val top = spark.sql("SELECT heavy_hitters(key, 64, 3) AS hh FROM hh_ints")
      .select(explode(col("hh")).as("e")).select("e.item", "e.n").collect()
    assert(top.length === 3 && top.forall(_.getString(0).forall(_.isDigit)))
    // misuse fails at analysis with a descriptive message, not a bare
    // cast/NPE out of function resolution
    def analysisMessage(sql: String): String =
      intercept[org.apache.spark.sql.AnalysisException] { spark.sql(sql) }.getMessage
    assert(analysisMessage("SELECT heavy_hitters(key, 64) FROM hh_ints")
      .contains("3 arguments"))
    assert(analysisMessage("SELECT heavy_hitters(key, key, 3) FROM hh_ints")
      .contains("literal"))
    assert(analysisMessage("SELECT heavy_hitters(key, 'many', 3) FROM hh_ints")
      .contains("integer literal"))
    assert(analysisMessage("SELECT heavy_hitters(key, 0, 3) FROM hh_ints")
      .contains("positive"))
  }

  test("summaries round-trip items longer than writeUTF's 64 KiB cap") {
    import spark.implicits._
    // shuffle-time serialize/deserialize used to writeUTF, which throws
    // UTFDataFormatException beyond 65535 encoded bytes
    val long1 = "x" * 70000
    val long2 = "y" * 70000
    val df = (Seq.fill(5)(long1) ++ Seq.fill(3)(long2) ++ Seq("short"))
      .toDF("item").repartition(4)
    val got = HeavyHitters.topItems(df, "item", 16, 3).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((long1, 5L), (long2, 3L), ("short", 1L)))
  }

  test("partition count does not change the result (mergeable summaries)") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val r1 = HeavyHitters.topItems(toks.repartition(1), "token", 4096, 15).collect()
    val r8 = HeavyHitters.topItems(toks.repartition(8), "token", 4096, 15).collect()
    assert(r1.toSeq === r8.toSeq)
  }
}
