package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import java.util.concurrent.TimeUnit

/** The cross-PROCESS face of [[PurgeRaceSpec]]: a second OS process (own
  * JVM, own SparkSession, own FileSystem/NIO state) purges a subject
  * while THIS JVM's merge sits in a widened stage→commit window. The
  * purge's linearization (in-place pass → pointer check → CAS-pinned
  * bump, re-pass on interlopers) must coordinate with the racing merge
  * through the filesystem alone. Whichever side commits first, the
  * closed form is the same: every key updated, the subject gone — from
  * current AND from every retained version — with zero claims, no lock,
  * and a manifest-valid current left behind. */
class CrossProcessPurgeSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private val addOpens = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))

  test("a second OS process purges against this JVM's in-flight merge: erasure and merge both hold") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-xpurge")
    val base = tmp.resolve("snap").toString
    val subject = 7L
    val seed = (0L until 100L).map(k => (k, k * 10)).toDF("k", "v")
    VersionedSnapshot.mergeInto(base, seed, Seq("k"),
      VersionedSnapshot.UpdateMatched, insertUnmatched = true,
      marker = "seed", numBuckets = 4, retain = 4)
    val ready = tmp.resolve("ready")
    val gate = tmp.resolve("gate")
    val childLog = tmp.resolve("child.log")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xms512m", "-Xmx3g",
      "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.streaming.CrossJvmPurgeMain",
      base, ready.toString, gate.toString, subject.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(childLog.toFile)
    val proc = pb.start()
    try {
      val deadline = System.currentTimeMillis() + 180000L
      while (!Files.exists(ready)) {
        assert(proc.isAlive, "purger JVM died before ready — " + tailOf(childLog))
        assert(System.currentTimeMillis() < deadline,
          "purger JVM never signaled ready — " + tailOf(childLog))
        Thread.sleep(50L)
      }
      // this JVM's merge: all keys updated, held at the commit door so
      // the child's purge lands inside the window
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      spark.conf.set(VersionedSnapshot.TestDelayBeforeCommitConf, "2500")
      val merger = new Thread(() => {
        try {
          val src = (0L until 100L).map(k => (k, k * 10 + 1000)).toDF("k", "v")
          VersionedSnapshot.retryOnConflict(attempts = 10, backoffMs = 100L) {
            VersionedSnapshot.mergeInto(base, src, Seq("k"),
              VersionedSnapshot.UpdateMatched, insertUnmatched = false,
              marker = "xjvm-merge", retain = 4)
          }
          ()
        } catch { case e: Throwable => errs.add(e); () }
      }, "graft-xpurge-merger")
      merger.start()
      // open the gate once the merge holds its claim (it is staging or
      // waiting at the delayed commit) — the purge races it from the
      // other process
      val cd = new java.io.File(base, "_claims")
      while (Option(cd.listFiles).forall(_.isEmpty)) {
        assert(System.currentTimeMillis() < deadline, "merge never claimed")
        Thread.sleep(20L)
      }
      Files.createFile(gate)
      merger.join(240000L)
      spark.conf.unset(VersionedSnapshot.TestDelayBeforeCommitConf)
      assert(!merger.isAlive, "merge thread wedged")
      if (!errs.isEmpty) throw errs.peek()
      assert(proc.waitFor(240, TimeUnit.SECONDS),
        "purger JVM did not exit — " + tailOf(childLog))
      assert(proc.exitValue == 0,
        s"purger failed (exit ${proc.exitValue}) — " + tailOf(childLog))
      assert(new String(Files.readAllBytes(childLog), "UTF-8")
        .contains("CROSSJVM_PURGED"),
        "purger never reported a committed purge — " + tailOf(childLog))

      // closed form regardless of commit order
      val got = VersionedSnapshot.read(spark, base).get.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (0L until 100L).filterNot(_ == subject)
        .map(k => k -> (k * 10 + 1000)).toMap
      assert(got == want, {
        val bad = (0L until 100L).filter(k => got.get(k) != want.get(k))
        s"cross-process purge race diverged at keys $bad"
      })
      val curV = VersionedSnapshot.currentVersion(spark, base).get
      (0L to curV).foreach { v =>
        VersionedSnapshot.readVersion(spark, base, v).foreach { df =>
          assert(df.filter(col("k") === subject).count() == 0,
            s"subject survives in retained v$v")
        }
      }
      val claims = Option(tmp.resolve("snap/_claims").toFile.listFiles)
        .map(_.map(_.getName).toSeq).getOrElse(Nil)
      assert(claims.isEmpty, s"leaked claims: $claims")
      assert(!Files.exists(tmp.resolve("snap/_COMMIT_LOCK")), "leaked commit lock")
      assert(VersionedSnapshot.validateCurrent(spark, base),
        "current fails manifest validation after the race")
    } finally {
      if (proc.isAlive) proc.destroyForcibly()
      ()
    }
  }

  private def tailOf(p: java.nio.file.Path): String =
    if (!Files.exists(p)) "(no child log)"
    else "child log tail:\n" + new String(Files.readAllBytes(p), "UTF-8")
      .linesIterator.toSeq.takeRight(25).mkString("\n")
}
