package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (guide: one per suite via
  * lazy val; getOrCreate dedupes across suites in the same JVM). */
object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSuite {
  lazy val spark: SparkSession = SparkSuite.session
  def sfDir: String = "/root/testdata/sf0.001"
}
