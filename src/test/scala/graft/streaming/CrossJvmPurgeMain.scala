package graft.streaming

import org.apache.spark.sql.SparkSession

/** Second-JVM purger for [[CrossProcessPurgeSpec]]: file-gate handshake
  * (touch `ready`, block on `gate`), then one linearized purge of a
  * single subject. A committed purge prints its sentinel and exits 0;
  * any failure propagates so the spec fails on the exit code. The
  * process boundary is the point: the purge's in-place pass, its
  * re-pass decision, and its CAS-pinned linearization commit coordinate
  * with the spec JVM's racing merge through the filesystem alone. */
object CrossJvmPurgeMain {
  def main(args: Array[String]): Unit = {
    val Array(base, readyPath, gatePath, subject) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crossjvm-purger")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      java.nio.file.Files.createFile(java.nio.file.Paths.get(readyPath))
      val deadline = System.currentTimeMillis() + 120000L
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(gatePath))) {
        if (System.currentTimeMillis() > deadline)
          sys.error("start gate never opened by the spec JVM")
        Thread.sleep(10L)
      }
      val n = VersionedSnapshot.purgeKeys(spark, base, Seq("k"),
        Seq(Seq(subject.toLong)), marker = "xjvm-purge")
      println(s"CROSSJVM_PURGED n=$n")
    } finally spark.stop()
  }
}
