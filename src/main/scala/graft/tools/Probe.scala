package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only environment probe: schema/read checks for the testdata tables.
  * Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "embeddings", "documents")) {
      println(s"=== $t ===")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(3, truncate = false)
      } catch { case e: Throwable => println(s"READ FAILED: ${e.getMessage.take(500)}") }
    }
    spark.stop()
  }
}
