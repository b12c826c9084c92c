package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe dense surrogate-key assignment (SURVEY §2 op 62).
  *
  * The naive formulation — `row_number().over(Window.orderBy(...))` — is a
  * single unpartitioned WindowExec: the whole table funnels through one
  * reducer, which at 100 TB is the canonical scale-killer. This operator
  * produces the IDENTICAL contiguous 1..N numbering with no single-partition
  * stage:
  *
  *   1. range-repartition + sort within partitions on the order keys →
  *      a total order across partition index boundaries, fully parallel;
  *   2. per-partition row numbering offset by an exclusive prefix sum of the
  *      per-partition counts. `RDD.zipWithIndex` implements exactly this
  *      (one lightweight count job over the already-shuffled data — shuffle
  *      files are reused, the map side does not re-run — then a map-only
  *      pass), so we use it rather than re-deriving the two-phase plumbing.
  *
  * The order keys must form a TOTAL order (e.g. include a unique key) for
  * the assignment to be deterministic across runs and cluster sizes.
  * Assembled at the InternalRow level (UnsafeProjection over a JoinedRow)
  * to skip the external-Row round trip of `df.rdd`.
  */
object SurrogateKey {

  def assign(df: DataFrame, order: Seq[Column], skCol: String = "sk"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(
      StructField(skCol, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      // generated projections must be instantiated inside the closure
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val skRow = new GenericInternalRow(1)
      it.map { case (row, idx) =>
        skRow.setLong(0, idx + 1L)
        proj(joined(skRow, row)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    Bridge.fromInternalRows(spark, rdd, schema)
  }
}
