package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column ↔ Expression conversion `private[sql]`
  * (classic.ExpressionUtils); extension libraries provide a one-object
  * bridge inside the sql package — the established pattern for shipping
  * native expressions without forking Spark. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion: a REAL Catalyst tree (with
    * UnresolvedAttributes ready for the analyzer), not the lazy
    * ColumnNodeExpression wrapper `expression` returns — required when the
    * expression is handed to the analyzer outside a Dataset context (e.g.
    * from a SQL function builder registered via SparkSessionExtensions). */
  def toExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The persisted RDD backing a `localCheckpoint()`ed DataFrame (None for
    * anything else). Iterative operators use it to UNPERSIST superseded
    * checkpoints eagerly: each loop round's `localCheckpoint` pins its
    * blocks in the block manager until the context cleaner happens to
    * collect them, and in a long-lived session (a bench JVM, a notebook,
    * a multi-query job) the orphaned blocks of past rounds evict page
    * cache and storage memory for every LATER query — measured as an
    * across-the-board slowdown of unrelated queries at sf1. CAUTION: only
    * free a frame that is provably never read again — a local checkpoint
    * truncates lineage, so an unpersisted one cannot be recomputed. */
  def checkpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Free a superseded local checkpoint's blocks (no-op for any other
    * frame) — the one unpersist policy for every iterative operator. */
  def freeCheckpoint(df: Dataset[_]): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
