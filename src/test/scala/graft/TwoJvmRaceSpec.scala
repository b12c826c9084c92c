package graft

import org.scalatest.funsuite.AnyFunSuite

/** Env-gated wrapper for the two-JVM lease evidence (r11 verdict item 2):
  * `GRAFT_TWO_JVM=1 sbt "testOnly graft.TwoJvmRaceSpec"` launches
  * `tools/two_jvm_race.sh`, which forks pairs of REAL JVMs (plain
  * `java -cp`, no sbt) against one shared layout warehouse — 6 rounds of
  * racing appendOnce (exactly one applier per tag, the loser's refusal
  * naming the holder's pid cross-process, content + certification
  * verified by an independent third JVM every round) plus a kill -9 of a
  * maintainer inside its marker window (the survivor breaks the stale
  * lease by tombstone rename, rebuilds the uncertified family, and
  * applies the batch). Gated because it forks ~17 Spark JVMs (~7 min) —
  * not a default-suite cost; ungated it reports as canceled, never
  * silently green. Round-12 run recorded in CROSSOVER.md. */
class TwoJvmRaceSpec extends AnyFunSuite {

  test("two real JVMs racing one warehouse: exclusivity, loud refusals, " +
      "kill -9 recovery (set GRAFT_TWO_JVM=1 to run)") {
    assume(sys.env.contains("GRAFT_TWO_JVM"),
      "set GRAFT_TWO_JVM=1 to run the ~7 min two-JVM evidence suite")
    val script = new java.io.File("tools/two_jvm_race.sh").getAbsoluteFile
    assert(script.exists(), s"missing $script")
    val pb = new ProcessBuilder("bash", script.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    info(out.linesIterator.filter(l =>
      l.startsWith("phase") || l.startsWith("ALL OK") || l.startsWith("FAIL"))
      .mkString("\n"))
    assert(code == 0 && out.contains("ALL OK"),
      s"two-JVM race suite failed (exit $code):\n${out.takeRight(4000)}")
  }
}
