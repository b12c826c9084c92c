package graft

import graft.layouts.LayoutFs
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FSDataOutputStream, Path}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The filesystem seam's exclusivity primitive, store by store (r11
  * verdict item 3 + ADVICE medium):
  *
  *  - LOCAL paths must be genuinely atomic. Hadoop's own local
  *    `create(overwrite = false)` is an exists-check followed by a
  *    truncating open — a TOCTOU window two same-root maintainers can
  *    both win, silently double-applying a batch — so the seam routes
  *    file: paths through java.nio CREATE_NEW (one O_CREAT|O_EXCL
  *    syscall). Pinned here by a 64-thread same-path race: exactly one
  *    winner, the file holds the winner's content intact.
  *  - REMOTE schemes take the store's `create(overwrite = false)`.
  *    Where the connector enforces it (HDFS NameNode; S3A conditional
  *    PUT where enabled) the seam is atomic; where the store silently
  *    overwrites, the seam DEGRADES to best-effort — both racers "win"
  *    — which is exactly why the lease is an exclusion guard layered on
  *    the marker protocol, never the sole correctness mechanism. Both
  *    behaviors are pinned against mock FileSystems registered under
  *    test schemes, so the documented caveat is an executable fact, not
  *    prose. */
class LayoutFsSpec extends AnyFunSuite {

  private def conf: Configuration = {
    val c = new Configuration()
    c.set("fs.mockcond.impl", classOf[MockConditionalFs].getName)
    c.set("fs.mockblind.impl", classOf[MockBlindFs].getName)
    c.setBoolean("fs.mockcond.impl.disable.cache", true)
    c.setBoolean("fs.mockblind.impl.disable.cache", true)
    c
  }

  test("local createExclusive is atomic: 64 threads racing one path yield " +
      "exactly one winner and an intact lease file") {
    val dir = Files.createTempDirectory("graft_lfs_race")
    val lease = new Path(dir.resolve("_GRAFT_LEASE_race").toString)
    val c = conf
    val go = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 64).map { i =>
      new Thread(() => {
        go.await()
        if (LayoutFs.createExclusive(lease, s"owner-$i|staleMs=60000", c))
          wins.incrementAndGet()
      })
    }
    threads.foreach(_.start()); go.countDown(); threads.foreach(_.join(30000))
    assert(wins.get == 1, s"${wins.get} of 64 racers won an exclusive create")
    val content = LayoutFs.readString(lease, c)
    assert(content.matches("owner-\\d+\\|staleMs=60000"),
      s"lease content torn by the race: '$content'")
    // and sequentially: the second attempt is refused
    assert(!LayoutFs.createExclusive(lease, "late", c))
    assert(LayoutFs.readString(lease, c) == content, "loser overwrote the lease")
  }

  test("a store whose create(overwrite=false) is enforced (conditional-put " +
      "semantics) gives exclusive acquisition through the seam") {
    val dir = Files.createTempDirectory("graft_lfs_cond")
    val lease = new Path(s"mockcond:${dir.resolve("lease")}")
    val c = conf
    assert(LayoutFs.createExclusive(lease, "first|staleMs=1000", c))
    assert(!LayoutFs.createExclusive(lease, "second|staleMs=1000", c),
      "conditional store must refuse the second exclusive create")
    assert(LayoutFs.readString(lease, c) == "first|staleMs=1000")
    assert(MockConditionalFs.rejections.get() >= 1,
      "the refusal must have come from the store's conditional create")
  }

  test("a store whose create silently overwrites degrades to best-effort — " +
      "the DOCUMENTED caveat, pinned as behavior: both racers win, which is " +
      "why the lease is a guard layered on the marker protocol") {
    val dir = Files.createTempDirectory("graft_lfs_blind")
    val lease = new Path(s"mockblind:${dir.resolve("lease")}")
    val c = conf
    assert(LayoutFs.createExclusive(lease, "a|staleMs=1000", c))
    // a second "exclusive" create SUCCEEDS on a blind store: the seam
    // cannot conjure atomicity the store lacks. Torn lease state is
    // still unservable (no completion marker → rebuild), which is the
    // layered-protocol argument this test makes executable.
    assert(LayoutFs.createExclusive(lease, "b|staleMs=1000", c),
      "blind store unexpectedly enforced exclusivity — mock broken?")
    assert(LayoutFs.readString(lease, c) == "b|staleMs=1000")
  }
  test("replaceIfContent (local): replaces only on an exact content match, " +
      "never creates a missing file, and N racers from one base content " +
      "yield exactly one winner (the lease heartbeat's CAS refresh)") {
    val dir = Files.createTempDirectory("graft_lfs_cas")
    val lease = new Path(dir.resolve("lease").toString)
    val c = conf
    assert(!LayoutFs.replaceIfContent(lease, "a", "b", c),
      "replace on a missing file must fail")
    assert(!LayoutFs.exists(lease, c), "replace must never create the file")
    LayoutFs.writeString(lease, "a", c)
    assert(!LayoutFs.replaceIfContent(lease, "x", "b", c))
    assert(LayoutFs.readString(lease, c) == "a", "mismatch must leave content")
    assert(LayoutFs.replaceIfContent(lease, "a", "b", c))
    assert(LayoutFs.readString(lease, c) == "b")
    // a same-content replace is the heartbeat's mtime refresh
    val m0 = LayoutFs.mtime(lease, c)
    Thread.sleep(1100) // coarse-mtime stores tick at 1 s
    assert(LayoutFs.replaceIfContent(lease, "b", "b", c))
    assert(LayoutFs.mtime(lease, c) > m0, "refresh did not bump the mtime")
    // all writers go through one OS file lock + compare: racing CAS
    // attempts from the same base content land exactly once
    val go = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 32).map { i =>
      new Thread(() => {
        go.await()
        if (LayoutFs.replaceIfContent(lease, "b", s"w$i", c))
          wins.incrementAndGet()
      })
    }
    threads.foreach(_.start()); go.countDown(); threads.foreach(_.join(30000))
    assert(wins.get == 1, s"${wins.get} of 32 CAS racers won")
    assert(LayoutFs.readString(lease, c).matches("w\\d+"))
  }

  test("replaceIfContent cannot land on a successor's lease: after a " +
      "breaker's rename-aside and a successor's exclusive acquisition, the " +
      "old holder's conditional refresh fails and the successor is intact " +
      "— the wedged-heartbeat window, closed as an executable fact") {
    val dir = Files.createTempDirectory("graft_lfs_succ")
    val lease = new Path(dir.resolve("_GRAFT_LEASE_x").toString)
    val c = conf
    val oldOwner = "pid=1 thread=1|staleMs=100"
    val newOwner = "pid=2 thread=1|staleMs=60000"
    assert(LayoutFs.createExclusive(lease, oldOwner, c))
    // a breaker judged the holder stale: atomic rename-aside, then the
    // successor's exclusive create makes a NEW file at the path
    val tomb = new Path(dir.resolve("_GRAFT_LEASE_x_broken_1").toString)
    assert(LayoutFs.fs(lease, c).rename(lease, tomb))
    assert(LayoutFs.createExclusive(lease, newOwner, c))
    // the wedged old holder's refresh: the compare runs against the
    // successor's content and fails — nothing is clobbered
    assert(!LayoutFs.replaceIfContent(lease, oldOwner, oldOwner, c),
      "old holder's conditional refresh landed on the successor's lease")
    assert(LayoutFs.readString(lease, c) == newOwner)
    // and the blind writeString it replaces WOULD have clobbered —
    // keeping the old failure mode pinned as the contrast
    LayoutFs.writeString(lease, oldOwner, c)
    assert(LayoutFs.readString(lease, c) == oldOwner)
  }

  test("replaceIfContent (remote): degrades to the compare-then-write " +
      "profile — match replaces, mismatch leaves content, missing fails " +
      "(the narrowed-not-closed caveat for stores without conditional PUT)") {
    val dir = Files.createTempDirectory("graft_lfs_cas_remote")
    val c = conf
    for (scheme <- Seq("mockcond", "mockblind")) {
      val lease = new Path(s"$scheme:${dir.resolve(s"lease_$scheme")}")
      assert(!LayoutFs.replaceIfContent(lease, "a", "b", c),
        s"$scheme: replace on a missing file must fail")
      LayoutFs.writeString(lease, "a", c)
      assert(!LayoutFs.replaceIfContent(lease, "x", "b", c))
      assert(LayoutFs.readString(lease, c) == "a",
        s"$scheme: mismatch must leave content")
      assert(LayoutFs.replaceIfContent(lease, "a", "b", c))
      assert(LayoutFs.readString(lease, c) == "b")
    }
  }
}

/** Mock object store with ENFORCED conditional create: behaves like a
  * store honoring If-None-Match (HDFS, S3A with conditional create) —
  * `create(overwrite = false)` on an existing key is rejected. Backed by
  * the local FS; registered under scheme `mockcond`. */
class MockConditionalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockcond"
  override def getUri: java.net.URI = java.net.URI.create("mockcond:///")
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream = {
    if (!overwrite && exists(f)) {
      MockConditionalFs.rejections.incrementAndGet()
      throw new FileAlreadyExistsException(s"conditional create rejected: $f exists")
    }
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}
object MockConditionalFs {
  val rejections = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Mock object store WITHOUT conditional create: `create(overwrite =
  * false)` silently truncates like a plain PUT — the degraded profile
  * the seam's scaladoc warns about. Registered under scheme `mockblind`. */
class MockBlindFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockblind"
  override def getUri: java.net.URI = java.net.URI.create("mockblind:///")
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
}
