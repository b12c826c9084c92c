package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator from SURVEY.md §2.
  *
  * @param name   the `SparkEntry.queries` key (SURVEY §2 "Name" column)
  * @param build  Spark-side implementation; second arg is the scale-factor
  *               directory holding one parquet file per table
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None
  *               for non-SQL-expressible ops (driver then records a weaker
  *               rows-only check)
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A category of operators (one object per SURVEY.md §2 letter). */
trait QueryGroup {
  def queries: Seq[GraftQuery]
}
