package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Purge vs concurrent writer — the resurrection hazard and its fix.
  *
  * A merge that CLAIMS and stages before a purge (its staged files are
  * rewritten from pre-purge reads) but COMMITS after it passes its CAS —
  * the purge's in-place pass never moves the pointer — and republishes
  * the purged subject into the new current. Both operations report
  * success; the GDPR erasure silently fails. [[VersionedSnapshot
  * .purgeKeys]] closes this by LINEARIZING: after a pass that rewrote
  * anything, it commits a zero-copy republish of the purged current
  * through the same claim+CAS protocol writers use, pinned to the exact
  * version the pass processed — a straddling writer then loses its CAS
  * and retries against purged manifests, and a writer that committed
  * mid-pass sends the purge back around to cover its version too. */
class PurgeRaceSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private def seedTable(base: String): Unit = {
    import spark.implicits._
    val seed = (0L until 20L).map(k => (k, k * 10)).toDF("k", "v")
    VersionedSnapshot.mergeInto(base, seed, Seq("k"),
      VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "seed", numBuckets = 4)
    ()
  }

  /** Start an all-keys update merge whose stage→commit window is widened
    * to `delayMs`, and return (thread, error sink). */
  private def straddler(base: String, delayMs: Long): (Thread, java.util.concurrent.ConcurrentLinkedQueue[Throwable]) = {
    import spark.implicits._
    spark.conf.set(VersionedSnapshot.TestDelayBeforeCommitConf, delayMs.toString)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t = new Thread(() => {
      try {
        val src = (0L until 20L).map(k => (k, k * 10 + 5)).toDF("k", "v")
        VersionedSnapshot.retryOnConflict() {
          VersionedSnapshot.mergeInto(base, src, Seq("k"),
            VersionedSnapshot.UpdateMatched, insertUnmatched = false,
            marker = "straddler", retain = 5)
        }
        ()
      } catch { case e: Throwable => errs.add(e); () }
    }, "graft-purge-straddler")
    t.start()
    (t, errs)
  }

  /** Block until the straddler holds its claim. Its merge resolved the
    * basis _BUCKETS file refs at entry (before claiming), so from here on
    * its staging reads PRE-purge files no matter how the purge below
    * interleaves — purge never deletes data files, only re-points
    * sidecars the merge will not reread. `settleMs` optionally lets the
    * staging writes land first (any interleave is correct for the wrapped
    * test; the raw-hazard test must instead purge BEFORE the staged
    * version dir exists, so its pass lists only the committed v0). */
  private def awaitClaim(base: String, settleMs: Long = 0L): Unit = {
    val cd = new java.io.File(base, "_claims")
    val deadline = System.currentTimeMillis() + 30000
    while (Option(cd.listFiles).forall(_.isEmpty)) {
      assert(System.currentTimeMillis() < deadline, "writer never claimed")
      Thread.sleep(20)
    }
    if (settleMs > 0) Thread.sleep(settleMs)
  }

  test("UNWRAPPED purge pass: a straddling merge resurrects the subject (the documented hazard)") {
    val base = Files.createTempDirectory("graft-praceraw").resolve("t").toString
    seedTable(base)
    val (writer, errs) = straddler(base, delayMs = 6000)
    try {
      awaitClaim(base)
      // precondition, not a regression: on a pathologically loaded host
      // the straddler could finish staging before we get here — cancel
      // (the wrapped test below is interleave-independent and still runs)
      assume(!new java.io.File(base, "v00001").exists(),
        "staged version dir appeared before the purge listed")
      // the raw in-place pass, no linearization commit
      val n = VersionedSnapshot.purgeKeysPass(spark, base, Seq("k"), Seq(Seq(3L)))
      assert(n >= 1, "the pass should have rewritten the seed version")
      writer.join(120000)
      assert(!writer.isAlive, "straddling merge never finished")
      if (!errs.isEmpty) throw errs.peek()
      // the hazard, pinned: the merge's CAS passed (no pointer move) and
      // its staged files — rewritten from PRE-purge reads — carry k=3
      // back into the new current. This is why purgeKeys must linearize.
      val resurrected = VersionedSnapshot.read(spark, base).get
        .filter(col("k") === 3L).count()
      assert(resurrected == 1,
        "expected the raw pass to lose against the straddler — if this " +
          "starts failing, the merge path changed and the linearization " +
          "wrapper may be droppable")
    } finally spark.conf.unset(VersionedSnapshot.TestDelayBeforeCommitConf)
  }

  test("purgeKeys linearizes: a straddling merge cannot resurrect the purged subject") {
    val base = Files.createTempDirectory("graft-prace").resolve("t").toString
    seedTable(base)
    val (writer, errs) = straddler(base, delayMs = 3000)
    try {
      awaitClaim(base, settleMs = 800)
      VersionedSnapshot.purgeKeys(spark, base, Seq("k"), Seq(Seq(3L)))
      ()
    } finally {
      writer.join(120000)
      spark.conf.unset(VersionedSnapshot.TestDelayBeforeCommitConf)
    }
    assert(!writer.isAlive, "straddling merge never finished")
    if (!errs.isEmpty) throw errs.peek()
    // gone from CURRENT and from every retained version
    val cur = VersionedSnapshot.read(spark, base).get
    assert(cur.filter(col("k") === 3L).count() == 0,
      "purged key resurrected by the straddling merge")
    val curV = VersionedSnapshot.currentVersion(spark, base).get
    (0L to curV).foreach { v =>
      VersionedSnapshot.readVersion(spark, base, v).foreach { df =>
        assert(df.filter(col("k") === 3L).count() == 0,
          s"purged key survives in retained v$v")
      }
    }
    // and the straddler's effect still landed for every other key
    val got = cur.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 20L).filterNot(_ == 3L)
      .map(k => k -> (k * 10 + 5)).toMap
    assert(got == want, s"merge effect lost under the purge race: $got")
  }

  test("purge under a quiesced table still returns 0 and commits nothing for a no-match subject") {
    val base = Files.createTempDirectory("graft-prace0").resolve("t").toString
    seedTable(base)
    val before = VersionedSnapshot.currentVersion(spark, base).get
    assert(VersionedSnapshot.purgeKeys(spark, base, Seq("k"), Seq(Seq(999L))) == 0)
    assert(VersionedSnapshot.currentVersion(spark, base).get == before,
      "a no-op purge must not commit a linearization version")
  }
}
