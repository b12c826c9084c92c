package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the base-relation cache (round-2 verdict "What's wrong
  * #4"): entries tied to a stopped session must not accumulate. Every
  * access purges entries whose session's context is stopped; the predicate
  * is injected here because stopping the real shared SparkContext would
  * kill every other suite in this JVM. */
class TablesCacheSpec extends AnyFunSuite with SparkTestBase {

  test("cache entries of stopped sessions are purged on access") {
    val dir = "/root/testdata/sf0.001"
    Tables.region(spark, dir) // populate
    assert(Tables.cachedEntryCount >= 1)

    // a live session's entries survive a purge pass
    Tables.purgeIf(_ => false)
    assert(Tables.cachedEntryCount >= 1)

    // once the session reports stopped, the next pass drops its entries
    Tables.purgeIf(_ => true)
    assert(Tables.cachedEntryCount == 0)

    // and a fresh access simply re-resolves (no stale state left behind)
    assert(Tables.region(spark, dir).count() > 0)
    assert(Tables.cachedEntryCount >= 1)
  }
}
