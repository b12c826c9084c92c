package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's error capture (r4 verdict item 5): a
  * deliberately broken row must surface as an `err` entry with its
  * timing, never as a silent (fast) success — and the message must be
  * JSON-safe (no quotes/newlines/backslashes that would corrupt the
  * single-line record). */
class BenchSpec extends AnyFunSuite {

  test("clocked: success carries no error; a crash is captured, sanitized, and still timed") {
    val (okSec, okErr) = Bench.clocked { Thread.sleep(5); 42 }
    assert(okErr.isEmpty)
    assert(okSec >= 0.005)

    val (sec, err) = Bench.clocked {
      Thread.sleep(5)
      throw new IllegalStateException("boom \"quoted\"\nline\\path" + ("x" * 500))
    }
    assert(sec >= 0.005, "a crashing row must still report the time it burned")
    assert(err.nonEmpty)
    val msg = err.get
    assert(msg.startsWith("IllegalStateException"), msg)
    assert(!msg.contains("\"") && !msg.contains("\n") && !msg.contains("\\"), msg)
    assert(msg.length <= "IllegalStateException: ".length + 120)
  }
}
