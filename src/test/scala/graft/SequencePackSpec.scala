package graft

import graft.etl.SequencePack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed weighted prefix sum behind llm_sequence_pack: exactness
  * vs a local scan, partition-layout invariance, and the chunk-assignment
  * contract. (The registry row itself is DuckDB-oracled against the
  * unpartitioned-window formulation the distributed form replaces.) */
class SequencePackSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("prefix sum equals the local exclusive scan, any input partitioning") {
    val base = Seq((3L, 7L), (1L, 2L), (4L, 0L), (2L, 5L), (5L, 1000000007L), (0L, 1L))
      .toDF("id", "w")
    for (parts <- Seq(1, 3, 7)) {
      val got = SequencePack.withPrefixSum(
          base.repartition(parts), Seq(col("id")), "w", "p")
        .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("p")))
      // local truth: sort by id, exclusive scan of w
      val local = Seq((0L, 1L), (1L, 2L), (2L, 5L), (3L, 7L), (4L, 0L), (5L, 1000000007L))
      val expect = local.map(_._1).zip(local.map(_._2).scanLeft(0L)(_ + _))
      assert(got.toSeq == expect, s"parts=$parts")
    }
  }

  test("llm_sequence_pack: contiguity, chunk math, and total-token conservation") {
    val rows = SparkEntry.queries("llm_sequence_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // docs ordered by doc_id: each prefix is the previous prefix + tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between doc ${a._1} and ${b._1}")
    }
    assert(rows.head._3 == 0L)
    rows.foreach { case (id, n, p, s0, s1) =>
      assert(s0 == p / 512 && s1 == (p + n - 1) / 512, s"chunk math for doc $id")
      assert(s1 >= s0)
    }
    // conservation: last prefix + last tokens = corpus token total
    val total = Tables.documents(spark, sf)
      .select(sum(size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
        .cast("long")).as("t")).collect().head.getLong(0)
    assert(rows.last._3 + rows.last._2 == total)
  }
}
