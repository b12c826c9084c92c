package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loader for the driver-generated testdata (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under the scale-factor directory. All reads go
  * through here so scan-level concerns (timestamp normalization, future
  * partitioning/bucketing hooks) live in one place.
  *
  * 100 TB note: at cluster scale each "file" becomes a partitioned directory;
  * only this object would change (add partition-pruning predicates + a
  * catalog), not the operators.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Base-relation cache keyed by (session, sfDir, table). `spark.read
    * .parquet` re-lists the path and re-reads footers for schema inference
    * on EVERY call — measured at ~0.1 s per table, i.e. ~0.4 s of pure
    * metadata work per 5-table query build. Reusing the resolved DataFrame
    * is the catalog behavior every engine (and a real Spark metastore
    * table) provides: only schema/file metadata is cached — each query
    * still plans, shuffles, and executes from scratch.
    *
    * Lifecycle: entries of STOPPED sessions are purged on every access, so
    * in a long-lived service that cycles sessions the cache never
    * accumulates dead entries (weak keys alone would not work here — the
    * cached DataFrame strongly references its own session, the documented
    * WeakHashMap value→key caveat — so eviction is tied to the explicit
    * `session.stop()` signal instead, which is deterministic and testable). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def purgeStopped(): Unit = purgeIf(_.sparkContext.isStopped)

  /** Purge predicate factored out so the lifecycle spec can drive it
    * without stopping the suite-shared SparkContext. */
  private[graft] def purgeIf(stopped: SparkSession => Boolean): Unit =
    cache.keySet.removeIf(k => stopped(k._1))

  /** Visible for the lifecycle spec: current cached entry count. */
  private[graft] def cachedEntryCount: Int = cache.size

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    purgeStopped()
    cache.computeIfAbsent((spark, sfDir, name), { _ =>
      name match {
        case "events" => eventsUncached(spark, sfDir)
        case _        => spark.read.parquet(s"$sfDir/$name.parquet")
      }
    })
  }

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (the
    * original testdata, which Spark's vectorized reader rejects with
    * PARQUET_TYPE_ILLEGAL — the legacy flag reads it as a raw ns long)
    * and TIMESTAMP(MICROS) (later regenerations, which arrive as a
    * timestamp directly). Branch on the LOADED type so either vintage
    * normalizes to µs NTZ: ns longs integer-divide to µs — `div` not `/`
    * (ns epoch values ~1.7e18 exceed 2^53; double division would lose
    * precision) — matching what DuckDB yields for `CAST(ts AS TIMESTAMP)`
    * on the same file (ns truncates to µs; µs is a no-op).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")

  private def eventsUncached(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType)
      case _        => col("ts").cast(TimestampNTZType)
    }
    raw.withColumn("ts", ts)
  }

  // Named accessors (readability in operator code).
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
