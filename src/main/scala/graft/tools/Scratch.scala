package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only scratch probe for stage-level timing experiments.
  * Current experiment: decompose llm_embed_neardup at sf3d (60 s in the
  * r4 sweep vs 28 s measured in r3) into its stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf3d")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dataBytes = Option(new java.io.File(dir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shufflePartitions =
      math.max(4, math.min(cpus.toInt, (dataBytes / (32L << 20)).toInt))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    println(s"SCRATCH shufflePartitions=$shufflePartitions")

    def clock(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
    val planted = base.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), x => x * 0.9 + 0.02).as("v"))
    val all = base.unionByName(planted)
    val grouped = all.groupBy(col("v"))
      .agg(min(col("vec_id")).as("rep_id"),
        sort_array(collect_list(col("vec_id"))).as("members"))
    val reps = grouped.select(col("rep_id").as("vec_id"), col("v"))

    var n = 0L
    clock("dedup_count") { n = reps.count(); n }
    val (nBands, nBits) = graft.etl.VectorLsh.adaptiveBandParams(n, simThreshold = 0.9)
    println(s"SCRATCH geometry bands=$nBands bits=$nBits projections=${nBands * nBits}")
    val bucketed = graft.etl.VectorLsh.withBandBuckets(
        reps, nBands = nBands, bitsPerBand = nBits, dims = 64)
      .select(col("vec_id"), col("band"), col("bucket"))
    clock("bucketed")(bucketed.count())
    val a = bucketed.as("a"); val b = bucketed.as("b")
    val candIds = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    clock("cand_raw")(candIds.count())
    val deduped = candIds.dropDuplicates(Seq("vec_a", "vec_b"))
    clock("cand_dedup")(deduped.count())
    val repPairs = deduped
      .join(reps.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(reps.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(expr("cosine_fast(va, vb)"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.9)
    clock("verified_pairs")(repPairs.count())
    clock("full_row")(graft.SparkEntry.queries("llm_embed_neardup")(spark, dir).count())

    spark.stop()
  }
}
