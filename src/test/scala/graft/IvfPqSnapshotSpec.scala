package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPqParams, IvfPqSnapshot}

/** Gates for the IVF-PQ codes identity sidecar ([[IvfPqSnapshot]]):
  * round-trip, legacy acceptance (pre-sidecar snapshots carry no
  * params.json), hard error on knob mismatch (m-mismatched codes would
  * ADC-score garbage — the invariant naming conventions alone enforced
  * until round 19), hard error on a corrupt sidecar. */
class IvfPqSnapshotSpec extends AnyFunSuite with SparkSuite {

  test("params sidecar round-trips; legacy snapshots read as None") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_id_").toString
    try {
      assert(IvfPqSnapshot.readParams(spark, dir).isEmpty,
        "a pre-sidecar snapshot has no identity — legacy, not an error")
      val p = IvfPqParams("residual", 8192, 16, 256, "beam64")
      IvfPqSnapshot.writeParams(spark, dir, p)
      assert(IvfPqSnapshot.readParams(spark, dir) === Some(p))
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }

  test("requireCompatible: legacy passes, matching passes, mismatch throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_id_").toString
    try {
      // legacy: no sidecar — naming convention remains the only identity
      IvfPqSnapshot.requireCompatible(spark, dir, "residual", 1024, 8, 256)
      IvfPqSnapshot.writeParams(spark, dir,
        IvfPqParams("residual", 1024, 8, 256, "argmin"))
      IvfPqSnapshot.requireCompatible(spark, dir, "residual", 1024, 8, 256)
      // the route is provenance, not a serve knob — never matched
      val mAfter = intercept[IllegalArgumentException] {
        IvfPqSnapshot.requireCompatible(spark, dir, "residual", 1024, 16, 256)
      }
      assert(mAfter.getMessage.contains("ADC-score garbage"))
      intercept[IllegalArgumentException] {
        IvfPqSnapshot.requireCompatible(spark, dir, "global", 1024, 8, 256)
      }
      intercept[IllegalArgumentException] {
        IvfPqSnapshot.requireCompatible(spark, dir, "residual", 8192, 8, 256)
      }
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }

  test("a corrupt sidecar is a hard error, not a silent legacy fallback") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_id_").toString
    try {
      graft.index.VectorIndex.writeSmallFile(spark, s"$dir/params.json",
        """{"flavor":"residual","num_cents":1024""")
      val e = intercept[RuntimeException] {
        IvfPqSnapshot.readParams(spark, dir)
      }
      assert(e.getMessage.contains("corrupt"))
    } finally graft.streaming.StreamingOps.deleteRecursively(dir)
  }
}
