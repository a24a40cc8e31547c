package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 removed the public `Column.expr`/`new Column(expr)`
  * surface when the Connect split landed). Packaged under
  * org.apache.spark.sql on purpose — the standard pattern for
  * libraries that add native Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan over a DataFrame's analyzed plan. */
  def ofPlan(df: DataFrame,
             f: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
               org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession, f(ds.logicalPlan))
  }

  /** The materialized RDD behind a `localCheckpoint()`ed Dataset —
    * its cached blocks are what an explicit release must unpersist,
    * and Dataset exposes no public handle to it (`df.rdd` builds a
    * NEW child RDD whose unpersist would be a no-op). None when the
    * plan is not a checkpoint. */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
  }
}
