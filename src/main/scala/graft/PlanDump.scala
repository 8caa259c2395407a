package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (optimization rounds): dump `.explain("formatted")` for the
  * named declared queries to `{outDir}/{name}.txt` — the judge checks
  * plan-shape claims in OPTIMIZATION_r*.md against these files.
  *
  * Usage: PlanDump <sfDir> <outDir> [queryNameOrPrefix...]
  * Same session shape as Bench (local[$SPARK_GRAFT_CPUS], AQE on) so the
  * dumped plan is the one the bench actually runs. Lifecycle-gate queries
  * that build/publish inside the query function execute those side effects
  * here too; the dumped plan is the final returned DataFrame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    try Queries.prepareShared(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[plandump] shared prepare failed: ${e.getMessage}")
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $name (${txt.length} chars)")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
