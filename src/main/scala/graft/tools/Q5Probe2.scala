package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: the supplier-join step of q5 in isolation, many repeats, to
  * pin the per-row cost of the broadcast probe variants at a scaled dir.
  *
  * RESOLVED by Q5Probe4 (r7): the "~2 µs/row SMJ→BHJ composition" this
  * probe measured is not an SMJ interaction at all — it is the
  * composite-key broadcast probe. Folding the cross-side equality
  * (c_nationkey = s_nationkey) into the join keys switches the hashed
  * relation from LongHashedRelation (single bigint key, dense array
  * probe) to UnsafeHashedRelation (UnsafeRow key build + byte-map lookup
  * per probe row), ~6× per-row cost, WSCG on or off. The single-key
  * variant this probe timed was rewritten by the optimizer into the
  * composite form whenever the filter was present, which is why "both"
  * looked slow. */
object Q5Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf12"
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
    def t(name: String)(f: => DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"Q5P2 $name%-22s min=${times.drop(1).min}%7.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    val li = spark.table(lineitemB).select("l_suppkey", "l_extendedprice")
    t("scan_only")(li.groupBy().agg(sum(col("l_extendedprice"))))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    t("bhj_longkey")(li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy().agg(sum(col("l_extendedprice")), sum(col("s_nationkey"))))
    val Seq(_, _, ordersCustB) = graft.operators.Joins.bucketedDims(spark, dir)
    val li4 = spark.table(lineitemB)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val smj = li4.hint("merge")
      .join(spark.table(ordersCustB), col("l_orderkey") === col("o_orderkey"))
    val smjSupp = smj.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
    t("smj_then_bhj")(smjSupp.groupBy().agg(sum(col("l_extendedprice"))))
    // supplier probed on the SCAN side, before the merge join: the BHJ
    // preserves the streamed side's bucketing+ordering, so the SMJ stays
    // exchange-free and the probe rides the cheap scan pipeline
    val liSupp = li4.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val smj2 = liSupp.hint("merge")
      .join(spark.table(ordersCustB), col("l_orderkey") === col("o_orderkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
    t("bhj_then_smj")(smj2.groupBy().agg(sum(col("l_extendedprice"))))
    smj2.groupBy().agg(sum(col("l_extendedprice"))).explain("formatted")
    // and a post-SMJ filter alone (no second join) to isolate whether the
    // SMJ->consumer composition itself is the tax
    t("smj_then_filter")(smj.filter(col("l_suppkey") % 7 =!= 3)
      .groupBy().agg(sum(col("l_extendedprice"))))
    // eager-aggregation shape: collapse the fact stream to (suppkey,
    // nationkey) partials straight off the SMJ, then join the dims on the
    // ~25k-row aggregate — the 72M-row BHJ probe disappears
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val partial = smj.groupBy(col("l_suppkey"), col("c_nationkey"))
      .agg(sum(rev).as("prev"))
    val q5e = partial
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(col("prev")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
    t("q5_eager_agg")(q5e)
    spark.stop()
  }
}
