package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed EXCLUSIVE prefix sum of a long weight column in a total
  * order — the building block for sequence packing (concatenate-and-chunk
  * training batches), byte-offset assignment, and any "running total as a
  * COORDINATE, not an aggregate" need.
  *
  * The naive formulation — `sum(w).over(Window.orderBy(...))` — is a single
  * unpartitioned WindowExec, the canonical 100 TB scale-killer (PlanSpec
  * bans it from every registry query). This is the weighted generalization
  * of [[SurrogateKey]]'s count-based numbering:
  *
  *   1. range-repartition + sort within partitions on the order keys →
  *      total order across partition index boundaries, fully parallel;
  *   2. one lightweight job computes PER-PARTITION weight totals (the
  *      shuffle files are reused — the map side does not re-run);
  *   3. exclusive scan of those totals on the driver (numPartitions longs —
  *      model-params-sized at any data scale) ships back as task-serialized
  *      offsets for a map-only running-sum pass.
  *
  * The order keys must form a TOTAL order (include a unique key) and the
  * weight column must be non-nullable LongType (a null would read as 0
  * silently — callers derive weights with non-null expressions like
  * `size(...)`). Assembled at the InternalRow level (UnsafeProjection over
  * a JoinedRow), mirroring SurrogateKey.
  */
object SequencePack {

  def withPrefixSum(df: DataFrame, order: Seq[Column], weightCol: String,
      prefixCol: String = "prefix"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val weightIdx = sorted.schema.fieldIndex(weightCol)
    require(sorted.schema(weightIdx).dataType == LongType,
      s"$weightCol must be LongType, got ${sorted.schema(weightIdx).dataType}")
    val rdd = sorted.queryExecution.toRdd
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(weightIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val schema = StructType(
      StructField(prefixCol, LongType, nullable = false) +: sorted.schema.fields)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      // generated projections must be instantiated inside the closure
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val pRow = new GenericInternalRow(1)
      var acc = offsets(pid)
      it.map { row =>
        pRow.setLong(0, acc)
        acc += row.getLong(weightIdx)
        proj(joined(pRow, row)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    Bridge.fromInternalRows(spark, out, schema)
  }
}
