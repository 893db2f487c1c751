package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only access to `private[sql]` extension internals. */
object TestBridge {
  def optimizerRules(
      ext: SparkSessionExtensions,
      session: org.apache.spark.sql.classic.SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
