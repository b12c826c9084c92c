package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decompose the sf0.1 per-query "planning floor" into MEASURED phases
  * (r13 verdict item 5: thirteen rounds attributed the ~3× same-scale gap
  * to "Catalyst planning/codegen" as a hypothesis; this pins the
  * composition as numbers). For each of three headline shapes, under the
  * EXACT bench session config and protocol (fresh DataFrame per timed
  * run, min-of-5 after 2 warmups):
  *
  *   total    — fresh build + .count(): the bench number
  *   analysis / optimization / planning — the Catalyst pipeline phases,
  *              from the query's own QueryPlanningTracker (min over 5
  *              fresh builds; each build re-runs the whole pipeline
  *              because the literals/plan are new objects)
  *   exec     — re-running ONE prepared physical plan as an RDD job:
  *              scheduling + execution, no driver pipeline
  *   residual — total − (tracked phases + exec): count()'s own wrapper
  *              planning, codegen-cache lookup, RDD materialization
  *
  * plus the top optimizer/analyzer rules by accumulated time across the
  * 5 builds — the candidates an exclusion experiment would target.
  *
  * A second pass re-times `total` with candidate planning-cost configs
  * (constraint propagation off) so "actionable or not" is itself a
  * measurement. Usage: runMain graft.tools.PhaseProbe [sfDir]. */
object PhaseProbe {

  private def minOf(k: Int)(f: => Unit): Double =
    (1 to k).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  private def session(cpus: String, shufflePartitions: Int,
      constraintProp: Boolean): SparkSession = {
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (16 * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", constraintProp.toString)
    // PHASE_EXTRA="k=v;k=v" — ad-hoc conf experiments (e.g. the fast-hash-
    // map codegen-cache investigation) without a rebuild per hypothesis
    val b = sys.env.get("PHASE_EXTRA").iterator
      .flatMap(_.split(";")).filter(_.nonEmpty).map(_.split("=", 2))
      .foldLeft(b0) { case (bb, Array(ck, cv)) => bb.config(ck, cv) }
      .getOrCreate()
    b.sparkContext.setLogLevel("WARN")
    b
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val dataBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val shufflePartitions =
      math.max(4, math.min(cpus.toInt, (dataBytes / (32L << 20)).toInt))

    val shapes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q1_pricing_summary" -> (graft.Bench.q1 _),
      "q3_join3_topk"      -> (graft.Bench.q3 _),
      "grouping_sets"      -> (graft.Bench.groupingSets _))

    // PHASE_CP selects the config list — A/B runs launch ONE config per
    // JVM (both-in-one-process lets the second config inherit the first's
    // C2-compiled Catalyst/janino paths and reads ~40% faster regardless
    // of the setting — measured r14, the same-JVM contamination)
    val configs = sys.env.getOrElse("PHASE_CP", "true,false")
      .split(",").toSeq.map(_.toBoolean)
    for (constraintProp <- configs) {
      val s = session(cpus, shufflePartitions, constraintProp)
      println(s"PHASE config constraintPropagation=$constraintProp " +
        s"shuffle_partitions=$shufflePartitions cpus=$cpus")
      for ((name, fn) <- shapes) {
        import org.apache.spark.sql.functions.{count => cnt, lit}
        // the COUNT plan — what the bench protocol actually executes
        // (df.count() wraps the query in a global aggregate, whose
        // optimizer pass eliminates the final orderBy: the df's OWN
        // sorted plan pays a range-sample job + ~10 janino compiles per
        // fresh toRdd, but the bench path pays neither — measured r14)
        def wrap(ss: SparkSession, d: String) =
          fn(ss, d).agg(cnt(lit(1)).as("cnt"))
        fn(s, sfDir).count(); fn(s, sfDir).count() // bench warmup protocol
        val total = minOf(5)(fn(s, sfDir).count())
        // DataFrame CONSTRUCTION alone: spark.read.parquet schema
        // resolution (footer reads + listing) + eager analysis — the
        // per-build cost a fresh-DataFrame-per-query protocol pays
        // before any planning
        val build = minOf(5) { fn(s, sfDir); () }
        // wall time to the physical plan (build + full Catalyst pipeline)
        val pipe = minOf(5) { wrap(s, sfDir).queryExecution.executedPlan; () }
        // ... and to the executable RDD: adds whole-stage codegen SOURCE
        // GENERATION + the janino compile-cache lookup (source text is
        // regenerated per fresh plan even on a cache hit). The compile
        // COUNTER distinguishes lookup from recompilation: identical
        // fresh plans should hit the source-keyed cache (0 compiles).
        val c0 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount
        val rddgen = minOf(5) { wrap(s, sfDir).queryExecution.toRdd; () }
        val compiles = (org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount - c0) / 5.0
        // fresh FULL execution through bare RDD machinery — no
        // Dataset.withAction/SQLExecution (whose listener events carry
        // eagerly-built plan-description strings): total − freshrdd =
        // the action-wrapper overhead per query
        val freshrdd = minOf(5) {
          wrap(s, sfDir).queryExecution.toRdd.count(); ()
        }
        // phase decomposition over 5 FRESH builds: each re-runs the whole
        // Catalyst pipeline (new plan objects), tracker read per build
        var phaseMin = Map.empty[String, Double]
        val ruleTime = scala.collection.mutable.Map.empty[String, Long]
        (1 to 5).foreach { _ =>
          val df = wrap(s, sfDir)
          df.queryExecution.executedPlan // force optimization + planning
          val phases = df.queryExecution.tracker.phases.map { case (p, sm) =>
            p -> (sm.endTimeMs - sm.startTimeMs) / 1e3
          }
          phaseMin = phases.map { case (p, t) =>
            p -> math.min(t, phaseMin.getOrElse(p, Double.MaxValue))
          }
          df.queryExecution.tracker.rules.foreach { case (r, rs) =>
            ruleTime(r) = ruleTime.getOrElse(r, 0L) + rs.totalTimeNs
          }
        }
        // ACTION-WRAPPER decomposition (r14 verdict item 3): total −
        // freshrdd leaves 14–79 ms/query in "Dataset action wrapper"
        // with 5× cross-shape variance. SQLExecution.withNewExecutionId
        // synchronously builds, per action: (a) the plan-description
        // string at spark.sql.ui.explainMode (default `formatted` —
        // re-rendered per action, UI on or off), (b) the SparkPlanInfo
        // tree for the listener event, then posts start/end events.
        // Time each part against one prepared qe, plus the whole
        // wrapper with an empty body.
        val qeW = wrap(s, sfDir).queryExecution
        qeW.executedPlan
        val emode = org.apache.spark.sql.execution.ExplainMode.fromString(
          s.sessionState.conf.getConfString("spark.sql.ui.explainMode", "formatted"))
        val tDesc = minOf(5) { qeW.explainString(emode); () }
        // SparkPlanInfo's object is private[execution]; reflect
        val spiObj = Class.forName("org.apache.spark.sql.execution.SparkPlanInfo$")
        val spiMod = spiObj.getField("MODULE$").get(null)
        val spiMeth = spiObj.getMethod("fromSparkPlan",
          Class.forName("org.apache.spark.sql.execution.SparkPlan"))
        val tInfo = minOf(5) { spiMeth.invoke(spiMod, qeW.executedPlan); () }
        val tWrapEmpty = minOf(5) {
          org.apache.spark.sql.execution.SQLExecution
            .withNewExecutionId(qeW, Some("phaseprobe")) { () }
        }
        println(f"PHASE $name wrapper plan_desc=${tDesc * 1000}%5.1f ms " +
          f"plan_info=${tInfo * 1000}%5.1f empty_wrap=${tWrapEmpty * 1000}%5.1f " +
          f"desc_chars=${qeW.explainString(emode).length}")
        // one prepared plan re-executed: scheduling + execution only
        val rdd = wrap(s, sfDir).queryExecution.toRdd
        rdd.count()
        val exec = minOf(5)(rdd.count())
        val tracked = phaseMin.values.sum
        println(f"PHASE $name%-20s total=${total * 1000}%6.1f ms " +
          f"build=${build * 1000}%5.1f pipe=${pipe * 1000}%5.1f " +
          f"rddgen=${rddgen * 1000}%5.1f freshrdd=${freshrdd * 1000}%5.1f " +
          f"compiles/build=$compiles%.1f " +
          phaseMin.toSeq.sortBy(_._1).map { case (p, t) =>
            f"$p=${t * 1000}%.1f"
          }.mkString(" ") +
          f" exec=${exec * 1000}%6.1f residual=${(total - tracked - exec) * 1000}%6.1f")
        val top = ruleTime.toSeq.sortBy(-_._2).take(5)
        top.foreach { case (r, ns) =>
          println(f"PHASE $name rule ${r.substring(r.lastIndexOf('.') + 1)}%-45s " +
            f"${ns / 5e6}%7.2f ms/build")
        }
      }
      // the bench scalar under this config: all three shapes, min-of-5
      val headlineTotal = shapes.map { case (_, fn) =>
        minOf(5)(fn(s, sfDir).count())
      }.sum
      println(f"PHASE headline3_total constraintPropagation=$constraintProp " +
        f"${headlineTotal * 1000}%6.1f ms")
      s.stop()
    }
  }
}
