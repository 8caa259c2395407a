package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `org.apache.spark.sql` package tree.
  *
  * Spark 4 removed the public `Column(expr)` / `Column.expr` accessors
  * (Columns are ColumnNode-backed); the supported conversion lives in
  * `private[sql]` `classic.ExpressionUtils`. Extension libraries reach it
  * by declaring a small object under the sql package — this is that shim.
  */
object GraftSqlBridge {

  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a LogicalPlan as a DataFrame (Dataset.ofRows is private[sql]). */
  def dataFrame(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The logical plan backing a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Idempotently install an extra planner strategy on a session. */
  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.classic.Strategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies = s +: cs.experimental.extraStrategies
    }
  }

  /** Idempotently install an extra optimizer rule on a session. */
  def addOptimizerRule(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r)) {
      cs.experimental.extraOptimizations = r +: cs.experimental.extraOptimizations
    }
  }

  /** Block until the async listener bus has delivered every queued
    * event (`listenerBus` is `private[spark]`). Metric-asserting specs
    * call this before sampling a listener-fed accumulator — without the
    * drain, late task-end events shift into the next batch's bucket. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a Catalyst function builder under a SQL name. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** The session's collision-free UUID (private[sql] on the session
    * itself) — cache keys built from identityHashCode can recur after
    * GC and resurrect dead-session handles; this cannot. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Run `f` with `pairs` overlaid on the session's SQLConf for the
    * CURRENT THREAD only (`SQLConf.withExistingConf`): plan construction
    * and eager actions inside `f` see the override through the dynamic
    * `SQLConf.get` that analyzer/optimizer rules read, while concurrent
    * queries on other threads keep the session's real conf — the scoped
    * alternative to flipping `spark.conf` session-globally around an
    * operator. */
  def withConfOverrides[T](spark: SparkSession, pairs: (String, String)*)(f: => T): T = {
    val cloned = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.clone()
    pairs.foreach { case (k, v) => cloned.setConfString(k, v) }
    org.apache.spark.sql.internal.SQLConf.withExistingConf(cloned)(f)
  }
}
