package graft.tools

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the PQ rows (train vs encode vs
  * checkpoint vs query) to localize their cost at sf0.1. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PQPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val (m, k, iters) = (8, 16, 4)
    val dims = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head.getInt(0)
    def docVec = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val reps = t("reps_checkpoint") {
      docVec.groupBy(col("v")).agg(min(col("vec_id")).as("vec_id"))
        .select(col("vec_id"), col("v")).localCheckpoint()
    }
    val books = t("train_4iters") { graft.etl.Pq.train(reps, dims, m, k, iters) }
    val coded = t("encode_checkpoint") {
      graft.etl.Pq.encodeWithStats(reps, dims, books)
        .select(col("vec_id"), col("codes"), col("recon_norm2")).localCheckpoint()
    }
    t("query_head") { docVec.filter(col("vec_id") === 0).head }
    t("adc_topk") { coded.orderBy(col("vec_id")).limit(10).count() }
    t("train_again") { graft.etl.Pq.train(reps, dims, m, k, iters) }
    spark.stop()
  }
}
