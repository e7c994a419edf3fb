package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path

/** The CONTRACT a deployment [[VersionedSnapshot.PointerStore]] must
  * satisfy before `graft.snapshot.pointerStore` may select it — written
  * as reusable behaviors so an object-store backend (S3 `If-Match`,
  * GCS generation-match, Azure ETag) is certified by subclassing with
  * its store and a scratch location: the sandbox has no object store,
  * but the contract is the part that must not drift, so deployment is
  * "implement the trait, extend this spec, flip the conf".
  *
  * The five laws, each an independent test against a fresh pointer:
  *  1. create-if-absent: expected=None writes iff nothing exists.
  *  2. compare-exchange: a put against the current content wins; a put
  *     against anything else loses and changes nothing.
  *  3. stall-immunity: a writer that read the pointer, then slept
  *     through another writer's flip, loses its late put — the compare
  *     happens at put time, not read time.
  *  4. single-winner: concurrent puts against one generation admit
  *     exactly one winner.
  *  5. reader atomicity: content observed mid-race is always some
  *     complete committed value, never partial.
  */
abstract class PointerStoreContract extends SparkSpec {

  /** The store under certification. */
  protected def store: VersionedSnapshot.PointerStore

  /** A fresh pointer path in the store's scheme (new location per call). */
  protected def freshPointer(tag: String): Path

  protected def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def contentOf(p: Path): Option[String] = {
    val f = fsFor(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim)
      finally in.close()
    }
  }

  test(s"${store.name}: create-if-absent writes iff nothing exists") {
    val ptr = freshPointer("law1")
    val f = fsFor(ptr)
    assert(store.putIfMatch(spark, f, ptr, "0", None))
    assert(contentOf(ptr).contains("0"))
    assert(!store.putIfMatch(spark, f, ptr, "1", None))
    assert(contentOf(ptr).contains("0"))
  }

  test(s"${store.name}: compare-exchange wins on current content, " +
      "loses (unchanged) on anything else") {
    val ptr = freshPointer("law2")
    val f = fsFor(ptr)
    assert(store.putIfMatch(spark, f, ptr, "10", None))
    assert(store.putIfMatch(spark, f, ptr, "11", Some("10")))
    assert(!store.putIfMatch(spark, f, ptr, "99", Some("10")))
    assert(!store.putIfMatch(spark, f, ptr, "99", Some("12")))
    assert(contentOf(ptr).contains("11"))
  }

  test(s"${store.name}: a stalled writer's late put against its stale " +
      "read loses, regardless of stall length") {
    val ptr = freshPointer("law3")
    val f = fsFor(ptr)
    assert(store.putIfMatch(spark, f, ptr, "0", None))
    val staleBasis = contentOf(ptr)
    // interim flip while the first writer "sleeps"
    assert(store.putIfMatch(spark, f, ptr, "1", Some("0")))
    Thread.sleep(50) // any stall length; the compare is at put time
    assert(!store.putIfMatch(spark, f, ptr, "2", staleBasis))
    assert(contentOf(ptr).contains("1"))
  }

  test(s"${store.name}: concurrent puts against one generation admit " +
      "exactly one winner") {
    val ptr = freshPointer("law4")
    val f = fsFor(ptr)
    assert(store.putIfMatch(spark, f, ptr, "0", None))
    (0 until 10).foreach { g =>
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (1 to 6).map { i =>
        val t = new Thread(() => {
          if (store.putIfMatch(spark, f, ptr, (g + 1).toString, Some(g.toString))) {
            wins.incrementAndGet(); ()
          }
        }, s"psc-$g-$i")
        t.start(); t
      }
      ts.foreach(_.join(30000))
      assert(wins.get == 1, s"generation $g: ${wins.get} winners")
      assert(contentOf(ptr).contains((g + 1).toString))
    }
  }

  test(s"${store.name}: readers racing the flips only ever observe " +
      "complete committed values") {
    val ptr = freshPointer("law5")
    val f = fsFor(ptr)
    assert(store.putIfMatch(spark, f, ptr, "1000", None))
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) contentOf(ptr).foreach { c =>
        if (c.toLongOption.forall(v => v < 1000L || v > 1100L)) { bad.add(c); () }
      }
    }, "psc-reader")
    reader.start()
    var v = 1000L
    while (v < 1100L) {
      assert(store.putIfMatch(spark, f, ptr, (v + 1).toString, Some(v.toString)))
      v += 1
    }
    stop = true
    reader.join(30000)
    assert(bad.isEmpty, s"reader saw partial/foreign content: ${bad.peek}")
  }
}

/** Certification of the shipped local CAS double against the contract. */
class CasFilePointerStoreContractSpec extends PointerStoreContract {
  protected def store: VersionedSnapshot.PointerStore =
    VersionedSnapshot.CasFilePointerStore
  protected def freshPointer(tag: String): Path = {
    val d = Files.createTempDirectory(s"graft-psc-$tag")
    new Path(d.resolve("_CURRENT").toString)
  }
}

/** The rename backend passes the sequential laws (1-3) by construction
  * but is NOT certified: law 4 (single-winner under concurrency) is
  * exactly what it cannot promise without the external fenced lock,
  * which is why [[VersionedSnapshot.commitPointer]] keeps that lock
  * protocol for non-conditional stores. No subclass on purpose. */
object RenameStoreIsNotCertified
