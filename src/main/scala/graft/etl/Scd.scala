package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** SCD Type-2 dimension maintenance (SURVEY §2 op 58) as a reusable
  * operator: the join formulation of `MERGE INTO` built from public Spark
  * primitives.
  *
  * Contract: `master` has columns (bk, attrs…, valid_from, valid_to,
  * is_current) with at most one current row per business key (plus any
  * number of closed history rows); `delta` has (bk, attrs…). Output: the
  * new master — changed keys closed at `effectiveDate` + re-versioned, new
  * keys inserted, everything else (including ALL history rows) untouched.
  *
  * Correctness note: the change/close/new-version logic runs against the
  * CURRENT slice only. Joining the full master would make every closed
  * history row of a changed key satisfy the "changed" predicate too — each
  * would be re-closed (valid_to overwritten to effectiveDate) and emit a
  * duplicate current row, corrupting the dimension on the second load of a
  * repeated-load workflow. History is carried through verbatim instead.
  *
  * 100 TB note: one shuffle join on the business key, and only the current
  * slice (≈ distinct keys, not full history) participates in it; keep the
  * master bucketed/partitioned by bk so repeated loads co-locate. The
  * history pass-through is scan + union — no shuffle.
  */
object Scd {

  def scd2Load(master: DataFrame, delta: DataFrame, attrs: Seq[String],
      effectiveDate: String): DataFrame = {
    val effD = lit(effectiveDate).cast(DateType)
    val history = master.filter(col("is_current") === 0)
    val m = master.filter(col("is_current") === 1).as("m")
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
    history.select(col("bk") +: attrs.map(col) :+ col("valid_from")
        :+ col("valid_to") :+ col("is_current"): _*)
      .unionByName(unchanged).unionByName(closed)
      .unionByName(newVersion).unionByName(inserted)
  }
}
