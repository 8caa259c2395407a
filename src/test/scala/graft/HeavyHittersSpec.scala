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

  test("partition count does not change the result (mergeable summaries)") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val r1 = HeavyHitters.topItems(toks.repartition(1), "token", 4096, 15).collect()
    val r8 = HeavyHitters.topItems(toks.repartition(8), "token", 4096, 15).collect()
    assert(r1.toSeq === r8.toSeq)
  }
}
