package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: per-query count() timing at an arbitrary sf dir, printed as it
  * goes (hotspot hunting for the bench). */
object Timing {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only.contains(q._1))
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(120)}"); -1L }
        println(f"TIMING $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    spark.stop()
  }
}
