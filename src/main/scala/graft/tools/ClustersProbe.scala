package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown for llm_dedup_clusters (round-7 constant
  * hunt): times groups-checkpoint, edge generation, propagation loop,
  * and final assembly separately, warm (2nd rep printed). */
object ClustersProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val BLOCK_CAP = 1000
    for (rep <- 1 to 2) {
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  STAGE rep$rep $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      }
      val docs = spark.read.parquet(graft.Fixtures.clusterCorpus(spark, dir))
      val groups = t("groups") {
        graft.etl.TextDedup.cappedBlocks(docs, "source", "doc_id", BLOCK_CAP)
          .groupBy(col("source"), col("text"))
          .agg(min(col("doc_id")).as("rep"),
            sort_array(collect_list(col("doc_id"))).as("members"))
          .withColumn("norm", graft.functions.TextOps.normalize(col("text")))
          .withColumn("sh", expr("word_shingles(norm, 3)"))
          .select(col("source"), col("rep"), col("members"), col("sh"))
          .localCheckpoint()
      }
      val edges = t("edges") {
        groups
          .groupBy(col("source"))
          .agg(collect_list(struct(col("rep"), col("sh"))).as("g"))
          .select(explode(expr("block_jaccard_edges(g, 0.5D)")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .localCheckpoint()
      }
      println(s"  edges rows=${edges.count()}  groups rows=${groups.count()}" +
        s"  sources=${groups.select("source").distinct.count()}")
      val cc = t("components") {
        graft.etl.TextDedup.connectedComponents(
          groups.select(col("rep").as("id")), edges).localCheckpoint()
      }
      val n = t("assembly") {
        cc.join(groups.select(col("rep").as("id"), col("members")), "id")
          .select(explode(col("members")).as("doc_id"), col("cluster_id"))
          .orderBy(col("doc_id").asc_nulls_first).count()
      }
      println(s"  rows=$n rounds=${graft.etl.TextDedup.lastIters}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
