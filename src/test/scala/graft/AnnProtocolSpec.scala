package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for the end-to-end ann-benchmarks protocol (AnnBenchmark):
  * synthesize → HDF5 + npy → ingest → reference answer → build → probe →
  * recall → save/load → re-verify, at spec scale, on BOTH source formats
  * — the reference E7 main's flow (example/dehnsw_example.cpp:132-230)
  * as one gated chain rather than piecewise (t1/v7/v17/Sweep). */
class AnnProtocolSpec extends AnyFunSuite with SparkSuite {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_annproto").toString
    val (train, test, neighbors) =
      AnnBenchmark.synthesize(nTrain = 600, nTest = 20, dim = 16, k = 10)
    AnnBenchmark.writeDataset(d, train, test, neighbors)
    d
  }

  test("exact-mode probe over the HDF5 ingestion chain has recall 1.0") {
    // searchWidth=0 is the per-shard exhaustive scan: recall against the
    // synthesized ground truth must be exactly 1.0 — any slip in the
    // HDF5 write, the distributed read, E1, the build, or the probe
    // surfaces here
    val r = AnnBenchmark.runProtocol(spark, dir, "hdf5", k = 10, searchWidth = 0)
    assert(r.n_train === 600 && r.n_test === 20 && r.dim === 16)
    assert(r.mean_recall === 1.0, s"exact recall ${r.mean_recall} != 1.0")
    assert(r.mean_recall_reloaded === 1.0)
    assert(r.results_invariant, "save/load round trip changed exact results")
    assert(r.npy_train_parity && r.npy_test_parity, "npy twins diverged from HDF5")
  }

  test("beam probe: recall above floor and identical across save/load, on all three formats") {
    val h5 = AnnBenchmark.runProtocol(spark, dir, "hdf5", k = 10, searchWidth = 16)
    val npy = AnnBenchmark.runProtocol(spark, dir, "npy", k = 10, searchWidth = 16)
    val fv = AnnBenchmark.runProtocol(spark, dir, "fvecs", k = 10, searchWidth = 16)
    for (r <- Seq(h5, npy, fv)) {
      assert(r.mean_recall >= 0.9, s"${r.source}: beam recall ${r.mean_recall} < 0.9")
      assert(r.results_invariant, s"${r.source}: reloaded index answered differently")
      assert(r.mean_recall_reloaded === r.mean_recall,
        s"${r.source}: recall drifted across save/load")
    }
    // byte-identical inputs + deterministic build ⇒ every ingestion
    // path must produce the same recall, not merely similar (the fvecs
    // face also reads ground truth from the .ivecs twin, so its
    // agreement covers that file too)
    assert(h5.mean_recall === npy.mean_recall,
      s"hdf5 (${h5.mean_recall}) vs npy (${npy.mean_recall}) recall diverged")
    assert(h5.mean_recall === fv.mean_recall,
      s"hdf5 (${h5.mean_recall}) vs fvecs (${fv.mean_recall}) recall diverged")
  }
}
