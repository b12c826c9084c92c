package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only (r17 optimization round): attribute each registry row's
  * single-run bench cost into Spark-JOB wall time vs everything else
  * (Catalyst analysis/optimization, codegen, driver loops between jobs),
  * plus the job/stage count — the number that tells whether a slow row is
  * paying compute or per-job scheduling floor. Replicates graft.Bench's
  * registry pass exactly: same session conf, same prewarmed builds, same
  * sorted single-cold-run-per-row protocol, so the wall numbers line up
  * with BENCH_LOCAL's registry_rows.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *   runMain graft.tools.RowProbe [prefix...]
  * Optional args filter which rows get PROBED (all rows still RUN, in
  * bench order, so cache state matches the bench).
  */
object RowProbe {

  private final class JobClock extends SparkListener {
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val nStages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    private val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      starts.put(j.jobId, System.nanoTime())
      descs.put(j.jobId,
        j.stageInfos.lastOption.map(_.name).getOrElse("?"))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      Option(starts.remove(j.jobId)).foreach { t0 =>
        val sec = (System.nanoTime() - t0) / 1e9
        jobNanos.addAndGet(System.nanoTime() - t0); nJobs.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_ROWPROBE_JOBS"))
          println(f"    job ${j.jobId}%4d $sec%7.3f s  ${descs.remove(j.jobId)}")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      nStages.incrementAndGet()
      taskNanos.addAndGet(s.stageInfo.taskMetrics.executorRunTime * 1000000L)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the bench's build phase, so the rows see prewarmed layouts/fixtures
    graft.operators.Joins.bucketedFacts(spark, sfDir)
    graft.operators.Joins.bucketedDims(spark, sfDir)
    graft.operators.Joins.bucketedEvents(spark, sfDir)
    graft.operators.Joins.rangeBandedEvents(spark, sfDir)
    graft.operators.Joins.rangeBandedEventsSalted(spark, sfDir)
    graft.operators.Joins.rangeBandedEventsAuto(spark, sfDir)
    graft.operators.Joins.rangeBandedEventsIncremental(spark, sfDir)
    graft.operators.Joins.bucketedFactsIncremental(spark, sfDir)
    graft.operators.Joins.bucketedEventsIncremental(spark, sfDir)
    graft.streaming.StreamIngest.ensureStreamedLayout(spark, sfDir)
    graft.operators.Sources.lineitemZPath(spark, sfDir)
    graft.operators.LlmOps.persistedIvfIndex(spark, sfDir)
    graft.operators.LlmOps.neardupRepbaseIndex(spark, sfDir)
    graft.operators.LlmOps.persistedKnnIvfIndex(spark, sfDir)
    graft.operators.LlmOps.pqIndexArtifacts(spark, sfDir)
    graft.operators.LlmOps.pqModels(spark, sfDir)
    graft.Fixtures.neardupCorpus(spark, sfDir)
    graft.Fixtures.clusterCorpus(spark, sfDir)
    graft.Fixtures.simhashTokens(spark, sfDir)
    graft.Fixtures.fingerprintGrams(spark, sfDir)
    graft.Fixtures.hashEmbedPairs(spark, sfDir)
    graft.Fixtures.minhashShingleHashes(spark, sfDir)
    graft.Fixtures.pqCodebooks(spark, sfDir)
    graft.Fixtures.ivfCentroids(spark, sfDir)
    graft.Fixtures.lshPlanes(spark, sfDir)
    graft.Fixtures.semdedupCentroids(spark, sfDir)
    graft.Fixtures.semdedupPlanes(spark, sfDir)
    graft.Fixtures.corpusPrepShingleHashes(spark, sfDir)
    graft.Fixtures.bpeMerges(spark, sfDir)

    println(f"${"row"}%-32s ${"wall"}%8s ${"jobsum"}%8s ${"driver"}%8s ${"njob"}%5s ${"nstg"}%5s ${"tasksum"}%8s")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val probed = args.isEmpty || args.exists(name.startsWith)
      val clock = new JobClock
      if (probed) spark.sparkContext.addSparkListener(clock)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name ERROR ${String.valueOf(e.getMessage).take(100)}") }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      if (probed) {
        // listener events are async; a short settle keeps counts complete
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(clock)
        val jobSec = clock.jobNanos.get() / 1e9
        println(f"$name%-32s $wall%8.3f ${jobSec}%8.3f ${wall - jobSec}%8.3f " +
          f"${clock.nJobs.get()}%5d ${clock.nStages.get()}%5d ${clock.taskNanos.get() / 1e9}%8.3f")
      }
    }
    spark.stop()
  }
}
