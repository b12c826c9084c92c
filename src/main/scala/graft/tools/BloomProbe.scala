package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}
/** Dev-only: quantify the runtime bloom filter on the join_bloom_runtime
  * shape — same query, bloom on vs off, in the forced shuffle-join regime. */
object BloomProbe {

  /** Cumulative shuffle write bytes across all completed stages — read
    * before/after a run for the per-configuration shuffle volume. */
  private object ShuffleMeter
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf6")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(ShuffleMeter)
    def meteredMb[A](f: => A): Double = {
      val b0 = ShuffleMeter.bytes.get()
      f
      // listener events are async — allow the bus to drain before reading
      // (listenerBus is spark-private; a short settle is enough for a
      // dev-only probe)
      Thread.sleep(500)
      (ShuffleMeter.bytes.get() - b0) / 1e6
    }
    def shape(s2: SparkSession): DataFrame = {
      val ord = Tables.orders(s2, dir)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
        .select("o_orderkey")
      Tables.lineitem(s2, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"), Det.dsum(col("l_extendedprice")).as("sum_price"))
    }
    def run(bloom: Boolean): (Double, Double) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloom.toString)
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // at sf6 the FILTERED orders side's size estimate exceeds the
      // default 10 MB creationSideThreshold and vanilla Spark declines to
      // inject — raise it so bloom=true actually measures the filter
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
      shape(s2).count() // warm
      println(s"BLOOMPROBE shuffle-join bloom=$bloom injected=" +
        shape(s2).queryExecution.executedPlan.toString.toLowerCase.contains("might_contain"))
      val mb = meteredMb(shape(s2).count()) // one metered run for bytes
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); shape(s2).count(); (System.nanoTime() - t0) / 1e9
      }
      (runs.min, mb)
    }
    val (offS, offMb) = run(false)
    val (onS, onMb) = run(true)
    println(f"BLOOMPROBE shuffle-join: off=$offS%.2f s ($offMb%.1f MB shuffled)  on=$onS%.2f s ($onMb%.1f MB shuffled)")

    // Same shape over the BUCKETED layout (zero-exchange SMJ): does the
    // bloom filter still pay when there is no fact shuffle to shrink?
    def shapeBucketed(s2: SparkSession): DataFrame = {
      val Seq(ordersB, lineitemB) = graft.layouts.Bucketed.ensure(s2, dir, Seq(
        graft.layouts.Bucketed.Spec("orders_b", Tables.orders(s2, dir), "o_orderkey"),
        graft.layouts.Bucketed.Spec("lineitem_b", Tables.lineitem(s2, dir), "l_orderkey")))
      s2.table(lineitemB).hint("merge")
        .join(s2.table(ordersB)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"), Det.dsum(col("l_extendedprice")).as("sum_price"))
    }
    def runBucketed(bloom: Boolean): (Double, Double) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", bloom.toString)
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
      println(s"BLOOMPROBE bucketed-join bloom=$bloom injected=" +
        shapeBucketed(s2).queryExecution.executedPlan.toString.toLowerCase.contains("might_contain"))
      shapeBucketed(s2).count()
      val mb = meteredMb(shapeBucketed(s2).count())
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); shapeBucketed(s2).count(); (System.nanoTime() - t0) / 1e9
      }.min
      (t, mb)
    }
    val (boffS, boffMb) = runBucketed(false)
    val (bonS, bonMb) = runBucketed(true)
    println(f"BLOOMPROBE bucketed-join: off=$boffS%.2f s ($boffMb%.1f MB shuffled)  on=$bonS%.2f s ($bonMb%.1f MB shuffled)")
    spark.stop()
  }
}
