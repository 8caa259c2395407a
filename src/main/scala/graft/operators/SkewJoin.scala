package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew-mitigation pattern for when one
  * join key dominates (AQE's skew handling covers sort-merge joins after
  * the fact; salting fixes the partition sizes up front and also applies
  * to aggregations):
  *
  *  - the FACT side gets a deterministic salt in [0, nSalts) derived from
  *    a high-cardinality column (NOT the join key — rows of the hot key
  *    spread across nSalts partitions);
  *  - the DIM side is replicated once per salt value (explode of a
  *    literal range — dims are the small side by contract, so the
  *    blow-up is nSalts x |dim|, bounded);
  *  - the join runs on (key, salt): each hot-key partition now holds
  *    ~1/nSalts of that key's rows.
  *
  * Results are EXACTLY the plain join's (each fact row still meets each
  * matching dim row exactly once — it meets only the replica carrying its
  * own salt). Deterministic salt (modulo of a row id) keeps the operator
  * oracle-checkable; a random salt would be equally correct but not
  * reproducible across engines.
  */
object SkewJoin {

  /** Deterministic salt column from a (high-cardinality) id column. */
  def saltOf(id: Column, nSalts: Int): Column = pmod(id, lit(nSalts)).cast("int")

  /** Inner equi-join of fact to dim on `key`, salted `nSalts` ways.
    * `saltSource` must be a fact column with high cardinality (a row id).
    * Output: fact columns + dim columns (like a plain inner join). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("_salt", saltOf(col(saltSource), nSalts))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
