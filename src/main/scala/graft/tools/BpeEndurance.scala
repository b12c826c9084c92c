package graft.tools

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE ENDURANCE probe (r4 verdict item 6): the delta-update path was
  * measured flat to 256 merges; the 32 k-merge production-vocab claim
  * rested on extrapolation. This runs 1 k+ merges over the sf3
  * corpus-derived word-type table (≈238 k types — above the 100 k delta
  * threshold) and publishes per-round cost in 128-round windows, so the
  * "per-round cost falls as later rounds touch fewer words" claim is a
  * measurement, not an asymptotic argument.
  *
  * Usage: runMain graft.tools.BpeEndurance [sfDir] [nMerges]
  */
object BpeEndurance {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf3"
    val nMerges = if (args.length > 1) args(1).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the llm_bpe_tokenize word table: dedup-first, group-size-weighted
    val g = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normalize(col("text")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("gsz"))
    val wf = g.select(col("gsz"), explode(split(col("t"), " ")).as("w"))
      .groupBy(col("w")).agg(sum(col("gsz")).as("cnt"))
      .localCheckpoint()
    val types = wf.count()
    println(s"BPEEND word_types=$types n_merges=$nMerges sf=$sfDir")

    val window = 128
    var win = new scala.collection.mutable.ArrayBuffer[Double]()
    val t0 = System.nanoTime()
    val merges = graft.etl.Bpe.train(wf, nMerges, onRound = (round, sec) => {
      win += sec
      if (round % window == 0) {
        println(f"BPEEND rounds ${round - window + 1}%5d-$round%5d  " +
          f"mean ${win.sum / win.size}%6.3f s/round  max ${win.max}%6.3f s  " +
          f"cum ${(System.nanoTime() - t0) / 1e9}%8.1f s")
        win = new scala.collection.mutable.ArrayBuffer[Double]()
      }
    })
    println(f"BPEEND done merges=${merges.size} total ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${(System.nanoTime() - t0) / 1e9 / merges.size}%.3f s/round overall)")
    spark.stop()
  }
}
