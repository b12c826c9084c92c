package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level cost attribution of the corpus-prep composite
  * rows (the two biggest rows of the decomposed registry bench) via
  * TrainingDataPrep's onStage callback, plus the attrition report's own
  * cost on top. */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // bench-identical partitioning (r17): probing under partitions=cpus
    // mis-attributed stage costs vs the data-driven count the bench runs
    val dataBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shufflePartitions =
      math.max(4, math.min(cpus.toInt, (dataBytes / (32L << 20)).toInt))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.remove(j.jobId)).getOrElse(System.nanoTime())
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec > 0.3) println(f"PREPPROBE   job ${j.jobId}%3d ${sec}%7.2f s")
      }
    })
    // min-of-2 protocol (r5 verdict item 1): run the full composite twice
    // in one JVM — run 1 is the cold in-pass number the registry bench
    // reports, run 2 is the warm number CROSSOVER's historical 5.1/3.9 s
    // were measured under. Stage caches are dropped between runs so run 2
    // re-executes every stage (warm = JIT + parquet footers + page cache,
    // not a served cache).
    val iters = if (args.length > 1) args(1).toInt else 2
    (1 to iters).foreach { it =>
      val (docs, planted, evalSh) = graft.operators.LlmOps.corpusPrepFixture(spark, sfDir)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val out = graft.examples.TrainingDataPrep.prepare(
        docs.unionByName(planted), evalNgrams = Some(evalSh),
        onStage = (name, sec) => println(f"PREPPROBE[$it] stage $name%-22s $sec%7.2f s"))
      val tStages = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      out.attrition.orderBy(col("stage_ord").asc_nulls_first).count()
      println(f"PREPPROBE[$it] attrition_report       ${(System.nanoTime() - t1) / 1e9}%7.2f s")
      println(f"PREPPROBE[$it] total                  ${(System.nanoTime() - t0) / 1e9}%7.2f s  (stages $tStages%.2f)")
      val t2 = System.nanoTime()
      val out2 = graft.examples.TrainingDataPrep.prepare(
        docs.unionByName(planted),
        neardupThreshold = 1.01, chunkDupMax = 1.0, evalNgrams = None)
      out2.attrition.orderBy(col("stage_ord").asc_nulls_first).count()
      println(f"PREPPROBE[$it] stages_twin_total      ${(System.nanoTime() - t2) / 1e9}%7.2f s")
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
