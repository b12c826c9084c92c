package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Dev-only: check whether any generated-code unit defeats the janino
  * source-keyed cache on identical fresh builds of a headline shape.
  * Builds the shape twice, diffs every whole-stage unit's generated
  * source line by line, and brackets each build's toRdd with the
  * compile counter. Its own r14 run DISPROVED the motivating
  * hypothesis ("q1 pays 2 recompiles, ~200 ms per fresh plan"): the
  * recompiles belong to this probe's bare-toRdd path, which executes
  * the pre-TakeOrdered SORTED plan that a real `count()` action never
  * compiles — `count()` itself pays 0 recompiles and every unit diff
  * is empty (CROSSOVER r14). Kept as the harness for re-testing the
  * cache on future plan shapes. */
object CodegenDiffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sources(): Seq[String] = {
      val df = graft.Bench.q1(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      plan.collect { case w: WholeStageCodegenExec => w.doCodeGen()._2.body }
    }
    def compiles(f: => Unit): Long = {
      val c0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      f
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount - c0
    }

    graft.Bench.q1(spark, sfDir).count() // warm
    val a = sources()
    val b = sources()
    println(s"CGDIFF units=${a.size} vs ${b.size}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      if (x == y) println(s"CGDIFF unit $i IDENTICAL (${x.length} chars)")
      else {
        val xs = x.linesIterator.toSeq; val ys = y.linesIterator.toSeq
        val diffs = xs.zip(ys).filter { case (l1, l2) => l1 != l2 }.take(6)
        println(s"CGDIFF unit $i DIFFERS (${xs.size}/${ys.size} lines, " +
          s"${diffs.size}+ diff lines):")
        diffs.foreach { case (l1, l2) =>
          println(s"CGDIFF   A: ${l1.trim.take(160)}")
          println(s"CGDIFF   B: ${l2.trim.take(160)}")
        }
      }
    }
    println(s"CGDIFF compiles_third_build=" +
      compiles(graft.Bench.q1(spark, sfDir).queryExecution.toRdd))
    // jobs per fresh count(): a global orderBy pays a RangePartitioner
    // SAMPLE job that executes the whole upstream aggregation before the
    // real job runs — a second full execution per fresh plan
    def jobsOf(f: => Unit): Int = {
      val j0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      f
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - j0
    }
    println(s"CGDIFF jobs_fresh_q1_count=" +
      jobsOf(graft.Bench.q1(spark, sfDir).count()))
    val prepared = graft.Bench.q1(spark, sfDir).queryExecution.toRdd
    prepared.count()
    println(s"CGDIFF jobs_prepared_recount=" + jobsOf(prepared.count()))
    println(s"CGDIFF compiles_fresh_count=" +
      compiles(graft.Bench.q1(spark, sfDir).count()))
    spark.stop()
  }
}
