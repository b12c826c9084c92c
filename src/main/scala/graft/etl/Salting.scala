package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the 100 TB pattern the prompt and
  * SCALE.md mandate): a hot key that owns a large fraction of the rows
  * serializes its shuffle partition; salting splits it across
  * `saltFactor` sub-keys, aggregates partially per (key, salt), then
  * merges the partials — two small shuffles instead of one skewed one.
  *
  * Works for any algebraic aggregate (sum/count/min/max, and decimal-exact
  * sums via Det — merge of partial decimal sums is still exact). AQE's
  * skew-join handling covers JOIN skew automatically; this helper covers
  * AGGREGATION skew, which AQE does not repartition.
  */
object Salting {

  /** Two-phase salted sum/count per key. `aggs` maps output column name →
    * column to sum. Deterministic: salt is a hash of stable columns, and
    * addition of partials is reassociation-safe for longs/decimals. */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column,
      saltFactor: Int, aggs: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val partials = salted
      .groupBy(key.as("_key"), col("_salt"))
      .agg(count(lit(1)).as("_pn"),
        aggs.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(s"_p_$n") }: _*)
    partials
      .groupBy(col("_key"))
      .agg(sum(col("_pn")).as("n"),
        aggs.toSeq.sortBy(_._1).map { case (n, _) => sum(col(s"_p_$n")).as(n) }: _*)
  }
}
