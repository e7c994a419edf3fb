package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

/** Snapshot isolation from the READER's seat: while a writer advances the
  * table through generation-stamped merges, a compactor repeatedly folds
  * it, and a purge erases one subject mid-history, concurrent readers
  * hammer `read()` and assert every single observation is one committed
  * state — never a mix.
  *
  * The generation stamp makes torn reads self-evident: every merge writes
  * ONE gen value to ALL rows, so any read that straddles a commit (half
  * old files, half new), catches a compaction mid-swap, or sees purged
  * sidecars torn would surface as a multi-gen row set, a wrong row count,
  * or a crash. Each reader also checks its observations are MONOTONE
  * (the pointer only advances) and that the purged key, once gone, never
  * reappears (the linearized purge + update-only merges cannot recreate
  * it). */
class SnapshotReaderIsolationSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("readers racing merges, compaction, and a purge always observe one committed state") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-riso").resolve("t").toString
    val gens = 6
    def genDf(g: Long) = (0L until 100L).map(k => (k, g)).toDF("k", "gen")
    VersionedSnapshot.mergeInto(base, genDf(0L), Seq("k"),
      VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "gen-0", numBuckets = 4, retain = 40)

    val errs = new ConcurrentLinkedQueue[Throwable]()
    @volatile var writerDone = false
    @volatile var writerBusy = false
    val writer = new Thread(() => {
      try {
        (1L to gens.toLong).foreach { g =>
          // a compact already in flight when the merge starts can still
          // win one CAS (the merge retries); the yield flag below only
          // stops the compactor LAUNCHING into the merge window, so a
          // small attempt budget suffices without modeling starvation —
          // a maintenance thread that never yields can starve writers
          // by construction, which is a scheduling policy, not isolation
          writerBusy = true
          try VersionedSnapshot.retryOnConflict(attempts = 12, backoffMs = 100L) {
            VersionedSnapshot.mergeInto(base, genDf(g), Seq("k"),
              VersionedSnapshot.UpdateMatched, insertUnmatched = false,
              marker = s"gen-$g", retain = 40)
          } finally writerBusy = false
          if (g == 3L) {
            // erase one subject mid-history, racing the readers;
            // purge-vs-writer racing itself is pinned deterministically
            // by PurgeRaceSpec
            writerBusy = true
            try VersionedSnapshot.purgeKeys(spark, base, Seq("k"), Seq(Seq(7L)))
            finally writerBusy = false
          }
          Thread.sleep(120L) // the compactor's launch window
        }
      } catch { case e: Throwable => errs.add(e); () }
      finally writerDone = true
    }, "graft-riso-writer")

    val compactor = new Thread(() => {
      try while (!writerDone) {
        if (!writerBusy)
          try VersionedSnapshot.retryOnConflict(attempts = 3) {
            VersionedSnapshot.compact(spark, base, Seq("k"),
              marker = "riso-compact", retain = 40)
          } catch {
            // sustained writer wins are expected; isolation is the readers' job
            case _: VersionedSnapshot.ConcurrentSnapshotUpdate => ()
            case _: IllegalStateException => ()
          }
        Thread.sleep(100L)
      } catch { case e: Throwable => errs.add(e); () }
    }, "graft-riso-compactor")

    case class Obs(gen: Long, n: Long, hasSubject: Boolean)
    def readOnce(): Obs = {
      val rows = VersionedSnapshot.read(spark, base).get
        .select("k", "gen").collect()
      val gset = rows.map(_.getLong(1)).distinct
      assert(gset.length == 1,
        s"TORN READ: one observation mixed generations ${gset.sorted.toSeq}")
      Obs(gset.head, rows.length, rows.exists(_.getLong(0) == 7L))
    }
    val readerObs = (1 to 2).map { i =>
      val out = new ConcurrentLinkedQueue[Obs]()
      val t = new Thread(() => {
        try while (!writerDone) { out.add(readOnce()); () }
        catch { case e: Throwable => errs.add(e); () }
      }, s"graft-riso-reader$i")
      (t, out)
    }

    writer.start(); compactor.start(); readerObs.foreach(_._1.start())
    writer.join(300000)
    compactor.join(60000)
    readerObs.foreach(_._1.join(60000))
    assert(writerDone && !compactor.isAlive && readerObs.forall(!_._1.isAlive),
      "threads wedged")
    if (!errs.isEmpty) throw errs.peek()

    readerObs.foreach { case (_, q) =>
      val obs = {
        val it = q.iterator(); val b = Seq.newBuilder[Obs]
        while (it.hasNext) b += it.next()
        b.result()
      }
      assert(obs.nonEmpty, "a reader never completed a single read")
      // every observation is internally complete: full key set, minus the
      // subject iff this observation post-dates the purge
      obs.foreach { o =>
        assert(o.n == (if (o.hasSubject) 100 else 99),
          s"INCOMPLETE READ: gen ${o.gen} had ${o.n} rows (subject=${o.hasSubject})")
      }
      // the pointer only advances: generations never go backward
      obs.sliding(2).foreach {
        case Seq(a, b) => assert(a.gen <= b.gen,
          s"NON-MONOTONE reads: gen ${a.gen} then ${b.gen}")
        case _ => ()
      }
      // erasure is permanent: once the subject vanishes it never returns
      val firstGone = obs.indexWhere(!_.hasSubject)
      if (firstGone >= 0)
        assert(obs.drop(firstGone).forall(!_.hasSubject),
          "purged subject reappeared in a later read")
    }
    // final state: last generation everywhere, subject gone from current
    // AND from every retained version
    val fin = readOnce()
    assert(fin.gen == gens && fin.n == 99 && !fin.hasSubject,
      s"final state wrong: $fin")
    val curV = VersionedSnapshot.currentVersion(spark, base).get
    (0L to curV).foreach { v =>
      VersionedSnapshot.readVersion(spark, base, v).foreach { df =>
        assert(df.filter(col("k") === 7L).count() == 0,
          s"purged subject survives in retained v$v")
      }
    }
  }
}
