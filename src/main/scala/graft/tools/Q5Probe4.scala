package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/* r9 consolidation: Q5Probe/2/3 deleted — their recorded runs live in
 * CROSSOVER.md (r6–r7 q5 sections) at their commits; this variant is the
 * survivor. */
/** Dev-only: mechanism isolation for the SMJ→BHJ composition tax.
  * Variants: single-long-key probe (LongHashedRelation) vs the two-key
  * rewrite (UnsafeHashedRelation), whole-stage codegen on/off, and a
  * generated-code dump to measure method sizes against the JIT's
  * 8 KB bytecode ceiling. */
object Q5Probe4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Seq(_, lineitemB) = graft.operators.Joins.bucketedFacts(spark, dir)
    val Seq(_, _, ordersCustB) = graft.operators.Joins.bucketedDims(spark, dir)
    def t(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"Q5P4 $name%-24s min=${times.drop(1).min}%7.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val li4 = spark.table(lineitemB)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    def smj = li4.hint("merge")
      .join(spark.table(ordersCustB), col("l_orderkey") === col("o_orderkey"))

    // E0 baselines
    t("smj_only_agg")(smj.groupBy().agg(sum(col("l_extendedprice"))))
    // E1: SINGLE long key probe downstream of SMJ — LongHashedRelation
    val e1 = smj.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy().agg(sum(col("l_extendedprice")), sum(col("s_nationkey")))
    t("smj_bhj_longkey")(e1)
    // E2: the two-key rewrite (filter folded into join keys)
    val e2 = smj.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy().agg(sum(col("l_extendedprice")))
    t("smj_bhj_twokey")(e2)
    // E3: whole-stage codegen OFF for the two-key shape — if the tax is a
    // codegen-interpretation cliff, OFF should cost about the same
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("smj_bhj_twokey_nowscg")(e2)
    t("smj_only_agg_nowscg")(smj.groupBy().agg(sum(col("l_extendedprice"))))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // E5: single-key BHJ + RESIDUAL filter the optimizer cannot fold into
    // join keys ((c - s) = 0 references both sides in one expression) —
    // same output as the two-key join, LongHashedRelation probe
    val e5 = smj.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") - col("s_nationkey") === 0)
      .groupBy().agg(sum(col("l_extendedprice")))
    t("smj_bhj_residual")(e5)
    // E6: composite-key probe on a BARE scan (no SMJ anywhere): if the tax
    // follows the key shape, this is slow too and the SMJ is exonerated
    val e6 = li4.join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
        pmod(col("l_orderkey"), lit(25)).cast("int") === col("s_nationkey"))
      .groupBy().agg(sum(col("l_extendedprice")))
    t("scan_bhj_twokey")(e6)
    val e6b = li4.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(pmod(col("l_orderkey"), lit(25)).cast("int") - col("s_nationkey") === 0)
      .groupBy().agg(sum(col("l_extendedprice")))
    t("scan_bhj_residual")(e6b)
    // E4: generated code size of the fused stage
    import org.apache.spark.sql.execution.debug._
    val code = e2.queryExecution.debug.codegenToSeq()
    code.zipWithIndex.foreach { case ((subtree, c, _), i) =>
      val lines = c.toString.linesIterator.size
      println(s"Q5P4 codegen[$i] lines=$lines head=${subtree.linesIterator.take(1).mkString}")
    }
    spark.stop()
  }
}
