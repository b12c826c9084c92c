package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal private[sql] bridge: building a DataFrame from a custom
  * LogicalPlan requires Dataset.ofRows, which is private[sql] — the
  * standard pattern for Spark extension libraries (cf. SNIPPETS.md [1],
  * public code doing exactly this) is one file inside the
  * org.apache.spark.sql namespace. Nothing else reaches into internals. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame from an RDD[InternalRow] without the external-Row round trip
    * (SparkSession.internalCreateDataFrame is private[sql]). Rows must
    * already be UnsafeRows matching `schema`. */
  def fromInternalRows(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
