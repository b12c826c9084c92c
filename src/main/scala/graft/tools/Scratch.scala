package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe for stage-level timing experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def timeIt(name: String)(f: => Unit): Unit = {
      f; f // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-30s min=${runs.min}%6.3f s")
    }

    // split per-collect cost: build+analyze / +physical plan / +execute
    import graft.Bench
    val m = Bench.getClass.getDeclaredMethods
    def q5 = {
      val mm = m.find(_.getName == "q5").get; mm.setAccessible(true)
      mm.invoke(Bench, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    timeIt("q5_build_only")(q5: Unit)
    timeIt("q5_plan")(q5.queryExecution.executedPlan: Unit)
    timeIt("q5_collect")(q5.collect(): Unit)
    // same physical plan re-collected (broadcast + shuffle stages reused)
    val df5 = q5
    df5.collect()
    timeIt("q5_recollect_same_df")(df5.collect(): Unit)

    def q3 = {
      val mm = m.find(_.getName == "q3").get; mm.setAccessible(true)
      mm.invoke(Bench, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    timeIt("q3_plan")(q3.queryExecution.executedPlan: Unit)
    timeIt("q3_collect")(q3.collect(): Unit)

    timeIt("knn_collect")(graft.SparkEntry.queries("llm_cosine_topk")(spark, dir).collect(): Unit)
    timeIt("dedup_collect")(graft.SparkEntry.queries("llm_dedup_exact")(spark, dir).collect(): Unit)
    def theta = graft.SparkEntry.queries("join_theta_range")(spark, dir)
    println("theta rows = " + theta.count())
    timeIt("theta_count")(theta.count(): Unit)
    timeIt("theta_nosort_count") {
      import graft.Tables
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          org.apache.spark.sql.functions.col("l_orderkey") === org.apache.spark.sql.functions.col("o_orderkey") &&
            org.apache.spark.sql.functions.col("l_shipdate") >= org.apache.spark.sql.functions.col("o_orderdate") &&
            org.apache.spark.sql.functions.col("l_shipdate") < org.apache.spark.sql.functions.col("o_orderdate") + org.apache.spark.sql.functions.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate").count(): Unit
    }
    timeIt("theta_collect")(theta.collect(): Unit)
    timeIt("q1_collect") {
      val mm = m.find(_.getName == "q1").get; mm.setAccessible(true)
      mm.invoke(Bench, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame].collect(): Unit
    }
    // q5 variants: shuffle-hash the big orders side instead of broadcasting
    import org.apache.spark.sql.functions._
    import graft.Tables
    def q5shj = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .hint("shuffle_hash")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, dir).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }
    timeIt("q5_shufflehash_count")(q5shj.count(): Unit)
    timeIt("q5_count") {
      val mm = m.find(_.getName == "q5").get; mm.setAccessible(true)
      mm.invoke(Bench, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
    }
    timeIt("windowrank_count") {
      val mm = m.find(_.getName == "windowRank").get; mm.setAccessible(true)
      mm.invoke(Bench, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame].count(): Unit
    }
    timeIt("windowrank_collect") {
      val mm = m.find(_.getName == "windowRank").get; mm.setAccessible(true)
      mm.invoke(Bench, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame].collect(): Unit
    }
    spark.stop()
  }
}
