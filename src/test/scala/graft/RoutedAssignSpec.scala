package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfKnn, PqKnn}

/** Gates for [[IvfKnn.routedAssign]] — the graph-routed coarse
  * quantizer that replaces the flat per-row argmin (linear in cells;
  * measured to dominate IVF-PQ encode past ~2k cells at 100M):
  *  - searchWidth = 0 (the kernel's exhaustive connected walk) is
  *    EXACT: row-for-row equal to [[IvfKnn.assign]], tie-breaks
  *    included (ascending-centroid_id insertion makes the kernel's
  *    (distance, globalId) order the argmin's (distance, centroid_id));
  *  - a production beam width clears an assignment-agreement floor on
  *    clustered data (the shape the router exists for);
  *  - [[PqKnn.residualsAssigned]] over the routed assignment feeds the
  *    same residual projection as the argmin path.
  */
class RoutedAssignSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dim = 16
  private val nClusters = 64

  private def corpus(n: Int, salt: Long) =
    (0 until n).map { i =>
      (i.toLong, ClusteredBench.clusteredVector(i.toLong, dim, nClusters,
        sigma = 0.05f, salt = salt))
    }.toDF("id", "embedding")

  test("routedAssign at width 0 equals the flat argmin exactly") {
    val c = corpus(2000, salt = 7L)
    val cents = IvfKnn.trainedCentroids(c, nClusters, iterations = 3).cache()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("cell")).as[(Long, Long)].collect().toMap
    val exact = key(IvfKnn.assign(c, cents))
    val routed = key(IvfKnn.routedAssign(c, cents, searchWidth = 0))
    assert(routed.size === exact.size)
    assert(routed === exact,
      "the exhaustive-walk routed assignment must equal the argmin row-for-row")
    cents.unpersist()
  }

  test("routedAssign at a production width clears the agreement floor") {
    val c = corpus(3000, salt = 11L)
    val cents = IvfKnn.trainedCentroids(c, nClusters, iterations = 3).cache()
    val exact = IvfKnn.assign(c, cents)
      .select(col("id"), col("cell").as("cell_x"))
    val routed = IvfKnn.routedAssign(c, cents, searchWidth = 8)
      .select(col("id"), col("cell").as("cell_r"))
    val agree = exact.join(routed, Seq("id"))
      .agg(avg((col("cell_x") === col("cell_r")).cast("double"))).head.getDouble(0)
    assert(agree >= 0.95, f"routed/argmin assignment agreement $agree%.4f < 0.95")
    cents.unpersist()
  }

  test("residualsAssigned over the routed assignment matches the argmin residuals at width 0") {
    val c = corpus(1000, salt = 13L)
    val cents = IvfKnn.trainedCentroids(c, nClusters, iterations = 2).cache()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("cell"), col("embedding"))
        .as[(Long, Long, Array[Float])].collect()
        .map { case (i, cl, e) => (i, cl, e.toSeq) }.toSet
    val viaArgmin = key(PqKnn.residuals(c, cents))
    val viaRouted = key(PqKnn.residualsAssigned(
      IvfKnn.routedAssign(c, cents, searchWidth = 0), cents))
    assert(viaRouted === viaArgmin)
    cents.unpersist()
  }
}
