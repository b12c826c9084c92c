package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** SCD Type-2 dimension maintenance (SURVEY §2 op 58) as a reusable
  * operator: the join formulation of `MERGE INTO` built from public Spark
  * primitives.
  *
  * Contract: `master` has columns (bk, attrs…, valid_from, valid_to,
  * is_current) with exactly one current row per business key; `delta` has
  * (bk, attrs…). Output: the new master — changed keys closed at
  * `effectiveDate` + re-versioned, new keys inserted, others untouched.
  *
  * 100 TB note: one shuffle join on the business key; keep the master
  * bucketed/partitioned by bk so repeated loads co-locate, and prune the
  * master to `is_current = 1` before joining (closed history never changes).
  */
object Scd {

  def scd2Load(master: DataFrame, delta: DataFrame, attrs: Seq[String],
      effectiveDate: String): DataFrame = {
    val effD = lit(effectiveDate).cast(DateType)
    val m = master.as("m")
    val d = delta.as("d")
    val j = m.join(d, col("m.bk") === col("d.bk"), "full")
    val attrChanged: Column = attrs
      .map(a => !(col(s"m.$a") <=> col(s"d.$a")))
      .reduce(_ || _)
    val changed = col("d.bk").isNotNull && col("m.bk").isNotNull && attrChanged
    def mAttrs = attrs.map(a => col(s"m.$a"))
    def dAttrs = attrs.map(a => col(s"d.$a"))
    val unchanged = j.filter(col("d.bk").isNull || (col("m.bk").isNotNull && !changed))
      .select(col("m.bk") +: mAttrs :+ col("m.valid_from") :+ col("m.valid_to")
        :+ col("m.is_current"): _*)
    val closed = j.filter(changed)
      .select(col("m.bk") +: mAttrs :+ col("m.valid_from") :+ effD.as("valid_to")
        :+ lit(0).as("is_current"): _*)
    val newVersion = j.filter(changed)
      .select(col("d.bk") +: dAttrs :+ effD.as("valid_from")
        :+ lit(null).cast(DateType).as("valid_to") :+ lit(1).as("is_current"): _*)
    val inserted = j.filter(col("m.bk").isNull)
      .select(col("d.bk") +: dAttrs :+ effD.as("valid_from")
        :+ lit(null).cast(DateType).as("valid_to") :+ lit(1).as("is_current"): _*)
    unchanged.unionByName(closed).unionByName(newVersion).unionByName(inserted)
  }
}
