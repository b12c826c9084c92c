package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Dev-only scratch probe for stage-level timing experiments.
  * Current experiment: why is llm_decontaminate_chunks' docLevel probe
  * (size + explode of the same shingle set) ~90x the cost of the
  * doc-level row's single-explode probe? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clock(name: String)(df: => DataFrame): DataFrame = {
      val d = df
      d.count() // warmup
      val t0 = System.nanoTime(); val n = d.count()
      println(f"SCRATCH $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      d
    }

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val groups = docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      .withColumn("norm", TextOps.normalize(col("text")))

    // A: single explode (the llm_decontaminate shape) — fast in the sweep
    clock("A_explode_only")(groups
      .select(col("rep"), col("members"),
        explode(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("sh")))

    // B: size + explode of the same expression (the docLevel shape) — slow
    clock("B_size_plus_explode")(groups
      .select(col("rep"),
        size(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("n_sh"),
        explode(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("sh")))

    // C: size only, no generator
    clock("C_size_only")(groups
      .select(col("rep"),
        size(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("n_sh")))

    // D: materialize the shingle array as an attribute first
    clock("D_materialized_shs")(groups
      .select(col("rep"), array_distinct(TextOps.wordShingles(col("norm"), 5)).as("shs"))
      .select(col("rep"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh")))

    val evalShingles = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(TextOps.wordShingles(
        concat_ws(" ", slice(split(TextOps.normalize(col("text")), " "), 3, 20)), 5)).as("sh"))
      .distinct()

    // E: B + broadcast semi-probe + count agg (the real docLevel shape)
    clock("E_join_agg")(groups
      .select(col("rep"),
        size(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("n_sh"),
        explode(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("rep"), col("n_sh"))
      .agg(count(lit(1)).as("n_hits")))

    // F: same but with the shingle set materialized as an attribute
    clock("F_join_agg_materialized")(groups
      .select(col("rep"), array_distinct(TextOps.wordShingles(col("norm"), 5)).as("shs"))
      .select(col("rep"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("rep"), col("n_sh"))
      .agg(count(lit(1)).as("n_hits")))

    val planE = groups
      .select(col("rep"),
        size(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("n_sh"),
        explode(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("rep"), col("n_sh"))
      .agg(count(lit(1)).as("n_hits"))
      .queryExecution.optimizedPlan
    println("SCRATCH planE:\n" + planE.treeString.take(5000))

    val planB = groups
      .select(col("rep"),
        size(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("n_sh"),
        explode(array_distinct(TextOps.wordShingles(col("norm"), 5))).as("sh"))
      .queryExecution.optimizedPlan
    println("SCRATCH planB:\n" + planB.treeString.take(4000))
    val planD = groups
      .select(col("rep"), array_distinct(TextOps.wordShingles(col("norm"), 5)).as("shs"))
      .select(col("rep"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      .queryExecution.optimizedPlan
    println("SCRATCH planD:\n" + planD.treeString.take(4000))

    spark.stop()
  }
}
