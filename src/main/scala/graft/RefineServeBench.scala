package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RefineKnn
import graft.sources.BaseStore

/** Measure REFINE STAGE 2 — pool-id point fetch from a published
  * [[graft.sources.BaseStore]] + full-precision rerank — in a JVM shaped
  * like the process that runs it in production.
  *
  * Why a dedicated main: the two stages of refined serving live in
  * DIFFERENTLY-shaped processes at scale. Stage 1 (the SQ8 beam) runs
  * where the shard graphs are resident — at the 100M decade that is a
  * ~100 GB heap holding all 128 graphs, which on a single 125 GB
  * container squeezes the page cache to nothing and taxes every store
  * read with full-heap GC (the faces-phase table records refine@256 at
  * 1,706 ms/q under that squeeze; the same JVM pays 785 ms/q for a FULL
  * 26 GB store scan — sequential I/O beats 10k cached-page lookups only
  * when there is no cache). Stage 2 touches no graph: it is a bounded
  * fetch + a |Q|×pool rerank, and on a cluster it runs on store-side
  * executors with normal cache headroom. This main measures exactly
  * that process: small heap, store pages cacheable, REAL disk store.
  *
  * The pool ids are a deterministic uniform surrogate (seeded per
  * query): stage-2 LATENCY depends only on pool size and id dispersion
  * — uniform ids are the worst case for page locality — while the
  * RESULT identity of store-backed refine is already gated bit-for-bit
  * elsewhere (BaseStoreSpec; the faces phase recall 1.000/0.994 from
  * this same store).
  *
  * Run: java -cp ... graft.RefineServeBench <storePath> [nQueries]
  *   [pool] [dim] [nClusters] [sigma]
  */
object RefineServeBench {

  def main(args: Array[String]): Unit = {
    val storePath = args.headOption.getOrElse(
      sys.error("usage: RefineServeBench <storePath> [nQueries] [pool]"))
    val nQueries = args.lift(1).map(_.toInt).getOrElse(100)
    val pool = args.lift(2).map(_.toInt).getOrElse(100)
    val dim = args.lift(3).map(_.toInt).getOrElse(64)
    val nClusters = args.lift(4).map(_.toInt).getOrElse(100000)
    val sigma = args.lift(5).map(_.toFloat).getOrElse(0.05f)
    val k = 10

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = BaseStore.publishedCount(spark, storePath)
    require(n > 0, s"$storePath carries no params.json row count")
    val qdf = (0L until nQueries.toLong).map(id =>
        (id, ClusteredBench.clusteredVector(id, dim, nClusters, sigma,
          ClusteredBench.QuerySalt)))
      .toDF("query_id", "embedding").cache()
    qdf.count()

    // deterministic uniform surrogate pool: `pool` ids per query
    val poolRows = for {
      q <- 0L until nQueries.toLong
      i <- 0 until pool
    } yield {
      val h = java.lang.Long.rotateLeft((q * 1000003L + i) * 2654435761L, 17)
      (q, math.floorMod(h, n))
    }
    val poolDf = poolRows.toDF("query_id", "neighbor_id")
      .localCheckpoint(true)
    println(s"stage-2 surrogate pool: $nQueries queries x $pool ids over " +
      s"n=$n store rows")

    for (mode <- Seq("point", "scan")) {
      def run(): Long = {
        val base = mode match {
          case "point" =>
            val ids = poolDf.select(col("neighbor_id")).distinct()
              .collect().map(_.getLong(0)).toSeq
            BaseStore.fetch(spark, storePath, ids)
          case _ => BaseStore.relation(spark, storePath)
        }
        RefineKnn.refine(poolDf, qdf, base, k, requireCoverage = true)
          .count()
      }
      run() // warm (page cache + codegen)
      val t0 = System.nanoTime(); run(); val w1 = System.nanoTime() - t0
      val t1 = System.nanoTime(); run(); val w2 = System.nanoTime() - t1
      println(f"refine stage-2 [$mode%5s]: ${math.min(w1, w2) / 1e6 / nQueries}%.1f " +
        f"ms/query (batch ${math.min(w1, w2) / 1e9}%.2f s, pool=$pool, k=$k)")
    }
    spark.stop()
  }
}
