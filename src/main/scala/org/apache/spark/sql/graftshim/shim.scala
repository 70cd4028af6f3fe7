package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 removed `new Column(expr)`; the supported classic
  * path is `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — hence this shim lives under the `sql` package.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`). Used by the prepared-recall serving path to execute a
    * cached template plan after splicing in a new request relation.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Run the session optimizer on an already-analyzed plan
    * (`sessionState` is `private[sql]`). The prepared-recall FAST path
    * replays the tiny request-derivation subtrees through this per call —
    * the full rule set over a <10-node one-row tree costs ~1 ms, vs
    * ~100 ms for the whole serving plan.
    */
  def optimize(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.optimizer.execute(plan)

  /** A CLONED SparkSession (same SparkContext, same SharedState — so the
    * shared CacheManager still serves cached relations) with one conf key
    * overridden in the clone's own sessionState. This is the only safe way
    * to plan under a different conf: the mutate-and-restore idiom
    * (`spark.conf.set` + finally) races (a concurrent overlapping override
    * captures the temporary value as "original" and restores it
    * permanently, and every concurrent query silently plans under the
    * temporary value), and a thread-local `SQLConf.withExistingConf`
    * override does NOT work for AQE — `InsertAdaptiveSparkPlan` overrides
    * `Rule.conf` to read `session.sessionState.conf` directly (verified
    * against the 4.1.2 bytecode), bypassing `SQLConf.get`.
    */
  /** Drain the async listener bus (`listenerBus` is `private[spark]`) —
    * a SparkListener-based job counter is only deterministic after the
    * queued events have been delivered; specs asserting jobs-per-call
    * (KeywordAutoFormSpec) call this between the action and the read.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  def sessionWithConf(spark: SparkSession,
      kv: (String, String)*): SparkSession = {
    val cloned =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .cloneSession()
    kv.foreach { case (k, v) => cloned.sessionState.conf.setConfString(k, v) }
    cloned
  }
}
