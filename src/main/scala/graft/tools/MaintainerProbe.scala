package graft.tools

import graft.Tables
import graft.layouts.Bucketed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TWO-JVM maintenance-race evidence driver (r11 verdict item 2): every
  * in-suite race spec exercises the lease machinery with THREADS inside
  * one JVM and one SparkSession, but the deployment shape the lease
  * exists for is two separate PROCESSES — two ingest jobs, or an ingest
  * and a compaction, sharing one warehouse over a real filesystem. This
  * main is one such process; `tools/two_jvm_race.sh` orchestrates pairs
  * of them (launched with plain `java -cp`, no sbt, so they really are
  * independent JVMs) and asserts on the MPROBE result lines:
  *
  *  - `prepare`   — build + certify the shared layout once;
  *  - `race TAG`  — park on a go-file barrier, then `appendOnce(TAG)`:
  *    across two racing JVMs exactly ONE must apply; the loser either
  *    refuses loudly (lease held — message names the holder's pid) or
  *    skips cleanly (arrived after the winner's stamps);
  *  - `hold MS`   — open a maintenance marker window (the exact lock +
  *    marker sequence append/compact use) and sleep inside it; the
  *    orchestrator kill -9's this JVM mid-window to fake a crashed
  *    maintainer;
  *  - `recover TAG` — retry ensure+appendOnce until the dead holder's
  *    lease goes stale and is broken (tombstone rename), the uncertified
  *    family is rebuilt from source, and the batch applies;
  *  - `check ROWS`  — independent verification JVM: re-ensure (must
  *    re-register, not rebuild), count, and compare.
  *
  * Results print as single `MPROBE {json}` lines on stdout. */
object MaintainerProbe {

  private val specName = "mprobe"

  private def session(root: String, staleMs: Long): SparkSession =
    SparkSession.builder()
      .appName(s"graft-maintainer-probe-${ProcessHandle.current().pid()}")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.layout.root", root)
      .config("spark.graft.layout.leaseStaleMs", staleMs.toString)
      .getOrCreate()

  private def slice(df: DataFrame, i: Int) =
    df.filter(pmod(xxhash64(col("o_orderkey")), lit(8)) === i)
  private def slices(df: DataFrame, is: Range) =
    df.filter(pmod(xxhash64(col("o_orderkey")), lit(8)).isin(is.map(_.toLong): _*))

  private def ensure(s: SparkSession, sfDir: String): String =
    Bucketed.ensure(s, sfDir, Seq(
      Bucketed.Spec(specName, slices(Tables.orders(s, sfDir), 0 to 5),
        "o_orderkey", srcTables = Seq("orders"))), buckets = 4).head

  private def out(kv: (String, String)*): Unit =
    // stdout line the orchestrator greps; values are pre-escaped tokens
    println(kv.map { case (k, v) => s""""$k":$v""" }
      .mkString("MPROBE {", ",", "}"))

  private def jstr(v: String): String =
    "\"" + v.replaceAll("[\"\\\\\\n\\r]", " ").take(300) + "\""

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val root = args(1)
    val sfDir = args(2)
    val staleMs = sys.env.getOrElse("MPROBE_STALE_MS", "60000").toLong
    val s = session(root, staleMs)
    val pid = ProcessHandle.current().pid()
    mode match {
      case "prepare" =>
        val t = ensure(s, sfDir)
        out("mode" -> jstr("prepare"), "pid" -> pid.toString,
          "table" -> jstr(t), "rows" -> s.table(t).count().toString)

      case "race" =>
        val tag = args(3)
        val goFile = new java.io.File(args(4))
        val t = ensure(s, sfDir) // certified: re-register, no lease needed
        val delta = slice(Tables.orders(s, sfDir), 6)
        val deadline = System.currentTimeMillis() + 30000
        while (!goFile.exists() && System.currentTimeMillis() < deadline)
          Thread.sleep(2)
        val (ran, refusal) =
          try (Bucketed.appendOnce(s, tag, Seq(t -> delta)), None)
          catch { case e: IllegalStateException => (false, Some(e.getMessage)) }
        out("mode" -> jstr("race"), "pid" -> pid.toString, "tag" -> jstr(tag),
          "ran" -> ran.toString, "refused" -> refusal.isDefined.toString,
          "refusal" -> jstr(refusal.getOrElse("")))

      case "hold" =>
        val holdMs = args(3).toLong
        val flag = new java.io.File(args(4)) // orchestrator waits for this
        val t = ensure(s, sfDir)
        Bucketed.appendGuard(s, Seq(t)) {
          // inside the marker window, lease held, heartbeats running —
          // exactly where a crashed compact/append dies
          flag.createNewFile()
          out("mode" -> jstr("hold"), "pid" -> pid.toString,
            "holding" -> "true")
          Thread.sleep(holdMs)
        }
        out("mode" -> jstr("hold"), "pid" -> pid.toString,
          "released" -> "true") // only reached if NOT killed

      case "recover" =>
        val tag = args(3)
        val t0 = System.currentTimeMillis()
        var attempts = 0
        var done = false
        var lastRefusal = ""
        var ran = false
        while (!done && System.currentTimeMillis() - t0 < 120000) {
          attempts += 1
          try {
            val t = ensure(s, sfDir) // breaks the stale lease + rebuilds
            ran = Bucketed.appendOnce(s, tag,
              Seq(t -> slice(Tables.orders(s, sfDir), 6)))
            done = true
          } catch {
            case e: IllegalStateException =>
              lastRefusal = String.valueOf(e.getMessage); Thread.sleep(1000)
          }
        }
        out("mode" -> jstr("recover"), "pid" -> pid.toString,
          "recovered" -> done.toString, "ran" -> ran.toString,
          "attempts" -> attempts.toString,
          "waited_ms" -> (System.currentTimeMillis() - t0).toString,
          "last_refusal" -> jstr(lastRefusal))

      case "check" =>
        val expect = args(3).toLong
        val t = ensure(s, sfDir)
        val rows = s.table(t).count()
        // certified = a completion marker in the CURRENT table dir
        val dirUri = s.sql(s"DESC FORMATTED $t")
          .filter(col("col_name") === "Location").head().getString(1)
        val certified = new java.io.File(
          new java.io.File(new java.net.URI(dirUri)), "_GRAFT_COMPLETE").exists()
        out("mode" -> jstr("check"), "pid" -> pid.toString,
          "rows" -> rows.toString, "expect" -> expect.toString,
          "content_ok" -> (rows == expect).toString,
          "certified" -> certified.toString)
    }
    s.stop()
  }
}
