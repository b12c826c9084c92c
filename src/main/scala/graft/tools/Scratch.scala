package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Dev-only scratch probe for stage-level timing experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // BPE per-round flatness: train on the sf0.1 word-frequency table at
    // increasing merge counts; per-round cost must stay ~flat.
    val wf = Tables.documents(spark, dir)
      .select(explode(split(TextOps.normalize(col("text")), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .cache()
    println(s"SCRATCH word types = ${wf.count()}")
    for (n <- Seq(12, 64, 256)) {
      val t0 = System.nanoTime()
      val m = graft.etl.Bpe.train(wf, n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH bpe n=$n%4d  total=$sec%7.2f s  per-round=${sec / m.size}%6.3f s  merges=${m.size}")
    }

    // richer vocabulary: bigram types (~|V|^2) — the Heaps-law-ish shape
    val wf2 = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextOps.wordShingles(
        graft.functions.TextOps.normalize(col("text")), 3)).as("bg"))
      .select(regexp_replace(col("bg"), " ", "_").as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .cache()
    println(s"SCRATCH 3gram word types = ${wf2.count()}")
    for (n <- Seq(64)) {
      val t0 = System.nanoTime()
      val m = graft.etl.Bpe.train(wf2, n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH bpe-3gram n=$n%4d  total=$sec%7.2f s  per-round=${sec / m.size}%6.3f s  merges=${m.size}")
    }

    // full-recount reference (the pre-delta formulation) for the same table
    def trainFullRecount(wordFreq: org.apache.spark.sql.DataFrame, nMerges: Int): Int = {
      var words = wordFreq.select(graft.etl.Bpe.chars(col("w")).as("syms"), col("cnt")).localCheckpoint()
      var rounds = 0
      var exhausted = false
      for (_ <- 1 to nMerges if !exhausted) {
        val best = words
          .select(col("cnt"), explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          rounds += 1
          words = words.select(
            graft.etl.Bpe.mergeStep(col("syms"), best.head.getString(0), best.head.getString(1)).as("syms"),
            col("cnt")).localCheckpoint()
        }
      }
      rounds
    }
    for (n <- Seq(64)) {
      val t0 = System.nanoTime()
      val r = trainFullRecount(wf2, n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH bpe-3gram-RECOUNT n=$n%4d  total=$sec%7.2f s  per-round=${sec / r}%6.3f s  merges=$r")
    }
    spark.stop()
  }
}
