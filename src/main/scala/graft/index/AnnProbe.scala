package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.DistanceMetric

/** What the SQL ANN rewrite needs from an index — the seam that lets
  * `ORDER BY vec_distance(...) LIMIT k` splice in a probe of EITHER a
  * sealed [[VectorIndex]] or a live [[LsmVectorIndex]] (base +
  * generations). Implementations must return (query_id, rank,
  * neighbor_id, distance) ordered by (distance, neighbor_id) per query,
  * with searchWidth 0 meaning exact. */
trait AnnProbe {
  /** Stable identity of THIS index state (changes when the indexed data
    * changes — e.g. per LSM ingest) — the rewrite's plan-cache key. */
  def probeId: String
  def probeMetric: DistanceMetric
  def probeSession: SparkSession
  def probeBatch(batch: Array[(Long, Array[Float])], k: Int, searchWidth: Int): DataFrame
  /** One-line shape description for the rewrite's log line. */
  def probeDescription: String
}
