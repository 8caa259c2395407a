package graft

import org.apache.spark.sql.SparkSession

import graft.index.VectorIndex

/** Probe-phase benchmark against an ALREADY-PERSISTED index — the
  * serving half of the decade lifecycle, decoupled from the build:
  * [[VectorIndex.buildTo]] published the index as compressed parquet;
  * this main loads that snapshot WITHOUT materializing any second copy
  * (`load(cache = false)` + `spark.graft.probeLayoutStorage=NONE` —
  * the shard graphs rehydrate once into the in-JVM ShardGraphCache and
  * the parquet stays the only on-disk copy) and drives the same soak +
  * gate protocol as KernelBench's soak mode. On a cluster this is
  * exactly the "other job probes the published snapshot" deployment
  * shape; on one node it is the disk-headroom mitigation for the 100M
  * probe (SCALE.md: the loaded handle's MEMORY_AND_DISK row cache plus
  * the probe-layout cache re-created the very spill buildTo avoided).
  *
  * Run: sbt "runMain graft.ProbeBench <indexPath> <dim> [nQueries] [k] [sw]"
  * Query vectors are the SAME deterministic per-id executor-side
  * generation as KernelBench's soak (seed id*2654435761+1), so results
  * are comparable run to run.
  */
object ProbeBench {

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      sys.error("usage: ProbeBench <indexPath> <dim> [nQueries] [k] [sw]"))
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nSoak = args.lift(2).map(_.toLong).getOrElse(20000L)
    val soakK = args.lift(3).map(_.toInt).getOrElse(10)
    val sw = args.lift(4).map(_.toInt).getOrElse(16)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.graft.probeLayoutStorage", "NONE")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val idx = VectorIndex.load(spark, path, cache = false)
    println(s"loaded index: shards=${idx.numShards} params=${idx.params}")

    // soak: driverless shuffled probe, KernelBench's soak protocol
    // (same deterministic query generation, same gate) so the numbers
    // are comparable main to main
    val soakQ = KernelBench.soakQueries(spark, nSoak, dim)
    val s2 = System.nanoTime()
    val nRes = idx.queryDistributed(soakQ, soakK, sw).count()
    val soakS = (System.nanoTime() - s2) / 1e9
    println(f"soak queryDistributed (sw=$sw%d, k=$soakK%d): $nSoak%d queries -> $nRes%d result rows, " +
      f"$soakS%.1f s wall, ${soakS * 1e6 / nSoak}%.1f us/query amortized COLD " +
      f"(per-shard parquet read + graph rebuild run INSIDE this job — with " +
      f"the copy-free load there is no earlier point to pay them; " +
      f"driver-side load was ${(s2 - t0) / 1e9}%.1f s before)")

    KernelBench.probeGate(idx, soakQ, soakK, sw, "probe")
    spark.stop()
  }
}
