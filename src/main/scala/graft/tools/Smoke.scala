package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: drives the driver's t1 smoke check (SparkEntry.entry rows>0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"SMOKE rows=${df.count()}")
    spark.stop()
  }
}
