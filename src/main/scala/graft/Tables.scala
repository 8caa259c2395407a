package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All tables are parquet, one file per table, at `{sfDir}/{name}.parquet`.
  * Schemas are fixed by the driver (FIXTURES.md §5); we read them as-is so
  * Catalyst can push filters/projections into the parquet scan.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet has carried its `ts` as either TIMESTAMP(NANOS)
    * (older generator runs) or TIMESTAMP(MICROS); Spark 4 rejects nanos by
    * default, so read nanos as long and convert (LONG division avoids the
    * >2^53 double-precision trap), and pass a native timestamp through
    * unchanged. Adaptive on the file's actual schema so a regenerated
    * dataset doesn't break every events-reading query. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  /** ts LONG (nanos) -> TIMESTAMP (micros); ts TIMESTAMP_NTZ -> TIMESTAMP
    * (session tz is pinned UTC, so the instant is unchanged — and
    * watermarks/windows require the LTZ type); ts TIMESTAMP -> as-is. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
