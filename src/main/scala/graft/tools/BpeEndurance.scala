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

    // production-scale TYPE table: the synthetic corpus vocabulary is 31
    // words by construction, so (exactly as the r4 strategy measurements
    // did — their 931/27,213-type tables are the corpus bigram/trigram
    // counts) the table is scaled with word 4-GRAMS as pseudo-words:
    // ~210k types at sf3, above the 100k delta threshold. Dedup-first,
    // group-size-weighted, words array materialized before the gram
    // lambda (the CSE discipline).
    val g = Tables.documents(spark, sfDir)
      .select(TextOps.normalize(col("text")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("gsz"))
    val wf = g.select(col("gsz"), split(col("t"), " ").as("ws"))
      // guard: sequence(1, 0) is the DESCENDING [1, 0] and slice(ws, 0, 4)
      // throws, so a <=3-word doc must short-circuit to an empty gram array
      .select(col("gsz"), explode(expr(
        "case when size(ws) >= 4 then " +
          "transform(sequence(1, size(ws)-3), i -> concat_ws('_', slice(ws, i, 4))) " +
          "else array() end"))
        .as("w"))
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
