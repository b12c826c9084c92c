package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only: attribute the five sub-second "floor shapes'" ~0.1 s gap to
  * DuckDB at sf0.1 (text_tokens, dedup_exact, knn_cosine,
  * tumbling_window, pivot_transpose — r7 verdict item 5). Per shape,
  * under the EXACT bench session config (local[4], AQE off, data-sized
  * shuffle partitions), measures min-of-5 after 2 warmups:
  *
  *   total   — fresh DataFrame per run (the bench number): analysis +
  *             optimization + physical planning + codegen-cache lookup +
  *             job scheduling + execution
  *   reexec  — re-action on ONE prepared DataFrame whose plan is already
  *             built: job scheduling + execution only
  *   sched   — spark.range(1).count(): the irreducible per-job floor
  *             (DAGScheduler + task dispatch + result fetch)
  *
  * total − reexec = driver-side plan pipeline; reexec − sched =
  * distributed execution (scan + shuffle + agg); sched = job floor.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val dataBytes = Option(new java.io.File(sfDir).listFiles())
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

    def minOf(k: Int)(f: => Unit): Double =
      (1 to k).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val shapes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "text_tokens"     -> (graft.Bench.textTokens _),
      "dedup_exact"     -> (graft.Bench.dedupExact _),
      "knn_cosine"      -> ((s: SparkSession, d: String) =>
        graft.SparkEntry.queries("llm_cosine_topk")(s, d)),
      "tumbling_window" -> (graft.Bench.tumbling _),
      "pivot_transpose" -> (graft.Bench.pivotTranspose _))

    // TRUE job floor: a prepared single-partition RDD counted repeatedly
    // (spark.range(1).count() would re-plan its aggregate every call and
    // measure the planning pipeline instead — measured 89.6 ms vs 4 ms)
    val unitRdd = spark.range(1).queryExecution.toRdd
    unitRdd.count(); unitRdd.count()
    val sched = minOf(5)(unitRdd.count())
    // and the planning pipeline alone, on the trivial query
    (1 to 3).foreach(_ => spark.range(1).count())
    val planTrivial = minOf(5)(spark.range(1).count())
    println(f"FLOOR sched_job_floor=${sched * 1000}%6.1f ms " +
      f"trivial_plan_pipeline=${planTrivial * 1000}%6.1f ms")
    for ((name, fn) <- shapes) {
      fn(spark, sfDir).count(); fn(spark, sfDir).count() // warmups
      val total = minOf(5)(fn(spark, sfDir).count())
      // one prepared physical plan, re-executed as an RDD job: no
      // analysis/optimization/codegen-lookup on the timed path (df.count()
      // would re-plan its aggregate each call)
      val rdd = fn(spark, sfDir).queryExecution.toRdd
      rdd.count()
      val reexec = minOf(5)(rdd.count())
      println(f"FLOOR $name%-16s total=${total * 1000}%6.1f ms " +
        f"reexec=${reexec * 1000}%6.1f ms plan=${(total - reexec) * 1000}%6.1f ms " +
        f"exec=${(reexec - sched) * 1000}%6.1f ms sched=${sched * 1000}%5.1f ms")
    }
    spark.stop()
  }
}
