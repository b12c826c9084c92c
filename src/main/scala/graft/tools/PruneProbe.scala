package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure whether a driver-collected `isin` batch-key filter
  * on a SORTED-key parquet band table actually prunes I/O under Spark
  * 4.1's parquet pushdown (row-group stats + column-index page
  * skipping), and at what row-group size. Writes a synthetic band table
  * (sorted string bkey, long rep) at several parquet block sizes, then
  * scans it with an isin of a micro-batch's keys and reports wall time
  * and scan metrics vs the unfiltered scan.
  *
  * Usage: runMain graft.tools.PruneProbe [nRows] [nKeys]
  */
object PruneProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 19000000L
    val nKeys = if (args.length > 1) args(1).toInt else 1600
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic band rows: zero-padded hex key ⇒ sort order == write order
    val src = spark.range(nRows)
      .select(format_string("%d:%016x", col("id") % 16, xxhash64(col("id"))).as("bkey"),
        col("id").as("rep"))
      .orderBy("bkey")

    for (blockBytes <- Seq(128L << 20, 1L << 20, 128L << 10)) {
      val path = s"/tmp/graft_pruneprobe_$blockBytes"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      src.coalesce(8).write
        .option("parquet.block.size", blockBytes.toString)
        .parquet(path)
      // batch keys: every (nRows/nKeys)-th key — uniform over the space
      val keys = spark.read.parquet(path)
        .filter(col("rep") % (nRows / nKeys) === 0)
        .select("bkey").as[String].collect().toSeq
      def time[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
      }
      // warm cache
      spark.read.parquet(path).count()
      val (tFull, cFull) = time(spark.read.parquet(path).groupBy().count().head.getLong(0))
      // above the threshold Spark degrades the parquet-side In to a
      // [min,max] range — useless over uniform keys; raise it so the
      // or-of-eq set reaches row-group/page stats
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        sys.env.getOrElse("SPARK_GRAFT_IN_THRESHOLD", "1000000"))
      val filtered = spark.read.parquet(path).filter(col("bkey").isin(keys: _*))
      // execute THIS plan instance so its scan metrics populate
      val (tFilt, cFilt) = time(filtered.queryExecution.executedPlan.execute().count())
      // the scan node's numOutputRows = rows surviving parquet-side
      // pruning (row-group stats / page index), BEFORE the post-scan
      // Filter — the direct measure of how much of the table was read
      val scanRows = filtered.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      val meta = filtered.queryExecution.executedPlan.collectLeaves()
        .map(_.toString.take(400)).mkString(" | ")
      val pushed = {
        val i = meta.indexOf("PushedFilters")
        if (i >= 0) meta.substring(i, math.min(meta.length, i + 160)) else "(none)"
      }
      println(f"PRUNE block=${blockBytes}%10d full=${tFull}%6.2f s ($cFull rows) " +
        f"isin(${keys.size})=${tFilt}%6.2f s ($cFilt rows) scanRows=$scanRows")
      println(s"  $pushed")
    }
    spark.stop()
  }
}
