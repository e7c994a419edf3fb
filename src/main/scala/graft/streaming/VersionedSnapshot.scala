package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{assert_true, col, count, lit}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Reader-atomic, multi-version snapshot publication — the transactional
  * upgrade of [[StreamingKpis.incrementalSnapshot]]'s rename-swap (whose
  * scaladoc documents exactly this seam).
  *
  * Layout (a poor-man's table format, pure Hadoop FS API, no table-format
  * dependency):
  * {{{
  *   base/
  *     _CURRENT        # pointer file: "37" — the committed version
  *     v00036/ …parquet + _LAST_BATCH
  *     v00037/ …parquet + _LAST_BATCH
  * }}}
  *
  * Why this beats the rename-swap:
  *  - **Reader atomicity.** The swap has a window where the snapshot path
  *    does not exist (between `snap→.old` and `.tmp→snap`), and rename
  *    visibility is not atomic on object stores at all. Here a reader
  *    resolves `_CURRENT` once and reads an immutable version directory;
  *    the pointer flip is a single-file atomic rename
  *    (`FileContext.rename(OVERWRITE)`), so every reader sees exactly the
  *    old or exactly the new version — never a mix, never an absent path.
  *  - **Concurrent-reader grace.** Old versions survive until `retain`
  *    more publishes, so a reader that resolved the pointer just before a
  *    flip keeps a complete, immutable input for its whole query.
  *  - **Crash safety.** A crash mid-write leaves a version directory with
  *    no pointer to it — invisible garbage, pruned on the next publish.
  *    A crash after the flip leaves extra old versions — pruned likewise.
  *    There is no recovery dance at batch start (the rename-swap needs
  *    one); the pointer IS the commit.
  *
  * Single-writer assumption: one publishing query per base dir (which
  * Structured Streaming's one-active-query-per-checkpoint already
  * enforces); concurrent writers would race the version counter.
  *
  * On a real table format (Delta/Iceberg) `publish` collapses to that
  * format's MERGE/replace commit — the call sites do not change shape.
  */
object VersionedSnapshot {

  private val PointerName = "_CURRENT"
  private val MarkerName = "_LAST_BATCH" // leading _: invisible to parquet reads
  private val ManifestName = "_MANIFEST" // data-file inventory, written pre-commit
  /** Session conf that makes [[publish]] throw after staging the version
    * dir but before the pointer commit — the crash-consistency seam. */
  private[graft] val CrashBeforeCommitConf = "graft.snapshot.crashBeforePointerCommit"

  private def fmtVersion(v: Long): String =
    "v" + "%05d".formatLocal(java.util.Locale.ROOT, v)
  private def versionPath(base: Path, v: Long): Path = new Path(base, fmtVersion(v))

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed version number, if any publish has completed. */
  def currentVersion(spark: SparkSession, baseDir: String): Option[Long] = {
    val f = fs(spark, baseDir)
    val ptr = new Path(baseDir, PointerName)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      val s = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      s.toLongOption
    }
  }

  /** Read the committed snapshot (None before the first publish). The
    * returned frame is bound to an immutable version directory, so it
    * stays consistent for the whole downstream query even if publishes
    * continue concurrently. */
  def read(spark: SparkSession, baseDir: String): Option[DataFrame] =
    currentVersion(spark, baseDir).map { v =>
      spark.read.parquet(versionPath(new Path(baseDir), v).toString)
    }

  /** (tag, batchId) recorded by the last publish; ("", -1) if none. */
  private[graft] def lastApplied(spark: SparkSession, baseDir: String): (String, Long) =
    currentVersion(spark, baseDir).map { v =>
      val f = fs(spark, baseDir)
      val m = new Path(versionPath(new Path(baseDir), v), MarkerName)
      if (!f.exists(m)) ("", -1L)
      else {
        val in = f.open(m)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        val cut = s.lastIndexOf(':')
        if (cut < 0) ("", -1L) else (s.substring(0, cut), s.substring(cut + 1).toLong)
      }
    }.getOrElse(("", -1L))

  /** Data-file inventory (`name:bytes` per line, sorted) written BEFORE
    * the pointer flip, so every committed version carries its own
    * integrity record. A replicated or promoted version directory is
    * checked with [[validateCurrent]] — missing, truncated, or stray data
    * files (the classic partial-copy failure on object stores) are
    * detected from listings alone, no file contents read. */
  private def writeManifest(f: FileSystem, dir: Path): Unit = {
    val entries = dataFiles(f, dir).map { case (name, len) => s"$name:$len" }
    val out = f.create(new Path(dir, ManifestName), true)
    try out.write(entries.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  private def dataFiles(f: FileSystem, dir: Path): Seq[(String, Long)] =
    f.listStatus(dir).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.getName, st.getLen))
      .sortBy(_._1)

  /** True iff the committed version's data files exactly match its
    * manifest (same names, same byte lengths, nothing extra). False when
    * no version or no manifest exists. */
  def validateCurrent(spark: SparkSession, baseDir: String): Boolean =
    currentVersion(spark, baseDir).exists { v =>
      val f = fs(spark, baseDir)
      val dir = versionPath(new Path(baseDir), v)
      val m = new Path(dir, ManifestName)
      f.exists(m) && {
        val in = f.open(m)
        val listed = try scala.io.Source.fromInputStream(in).getLines().toSeq finally in.close()
        val expected = listed.filter(_.nonEmpty).map { line =>
          val cut = line.lastIndexOf(':')
          (line.substring(0, cut), line.substring(cut + 1).toLong)
        }
        expected == dataFiles(f, dir)
      }
    }

  /** Write `df` as the next version and atomically flip the pointer to
    * it. Returns the published version number. `retain` is the number of
    * versions kept INCLUDING the new one (min 1). */
  def publish(df: DataFrame, baseDir: String, marker: String, retain: Int = 2): Long = {
    require(retain >= 1, "retain must keep at least the current version")
    val spark = df.sparkSession
    val f = fs(spark, baseDir)
    val base = new Path(baseDir)
    f.mkdirs(base)
    val current = currentVersion(spark, baseDir).getOrElse(-1L)
    def versionOf(name: String): Option[Long] =
      if (name.length == 6 && name.startsWith("v")) name.drop(1).toLongOption else None
    val existing = f.listStatus(base).toSeq
      .flatMap(st => versionOf(st.getPath.getName).map(_ -> st.getPath))
    // uncommitted leftovers from crashed publishes sit ABOVE the pointer;
    // never reuse their numbers (a half-written dir must not become the
    // commit target), just clear them
    existing.filter(_._1 > current).foreach { case (_, p) => f.delete(p, true) }
    val next = math.max(current, existing.map(_._1).maxOption.getOrElse(-1L)) + 1
    val target = versionPath(base, next)
    df.write.mode("overwrite").parquet(target.toString)
    val out = f.create(new Path(target, MarkerName), true)
    try out.write(marker.getBytes("UTF-8")) finally out.close()
    writeManifest(f, target)
    // crash-consistency fault-injection point (spec-only): everything
    // above is uncommitted staging, everything below is the commit. A
    // crash HERE must leave readers on the previous version and be healed
    // by the next publish — VersionedSnapshotSpec drives this seam.
    if (spark.conf.getOption(CrashBeforeCommitConf).contains("true"))
      throw new IllegalStateException(
        s"injected crash before pointer commit ($CrashBeforeCommitConf)")
    // the commit: single-file atomic rename-with-overwrite onto _CURRENT
    val tmpPtr = new Path(base, PointerName + ".tmp")
    val ptrOut = f.create(tmpPtr, true)
    try ptrOut.write(next.toString.getBytes("UTF-8")) finally ptrOut.close()
    FileContext.getFileContext(base.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmpPtr, new Path(base, PointerName), Options.Rename.OVERWRITE)
    // retention: drop committed versions older than the newest `retain`
    existing.filter { case (v, _) => v <= current && v <= next - retain }
      .foreach { case (_, p) => f.delete(p, true) }
    next
  }

  /** MERGE INTO's matched-row clause: overwrite with the source row, or
    * delete the target row. */
  sealed trait MatchedAction
  case object UpdateMatched extends MatchedAction
  case object DeleteMatched extends MatchedAction

  /** Row-level MERGE INTO against the versioned snapshot — the
    * Delta/Iceberg `MERGE INTO target USING source ON keys WHEN MATCHED
    * THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT` contract,
    * re-expressed as a declarative plan + one copy-on-write [[publish]]:
    *
    *   - matched + [[UpdateMatched]]: target row replaced by source row
    *   - matched + [[DeleteMatched]]: target row dropped
    *   - unmatched source rows inserted iff `insertUnmatched`
    *   - untouched target rows carried over verbatim
    *
    * Shapes: one shuffle equi-join on `keys` (anti/semi — never a row
    * explosion) plus a union; the commit inherits publish's atomic
    * pointer flip, so readers see the pre- or post-merge snapshot, never
    * a torn mix, and a crash mid-merge is healed by the next publish.
    *
    * Source rows must be UNIQUE per key (the standard MERGE
    * precondition — a multi-match makes the update nondeterministic);
    * enforced distributed-side with a codegen assert, same discipline as
    * Anomaly's overflow require.
    *
    * Scale note: this rewrites the FULL snapshot per merge —
    * copy-on-write at directory granularity. A production table format
    * (Delta/Iceberg) narrows the rewrite to touched FILES via min/max
    * pruning on the join keys; this call site is exactly where that
    * engine slots in (COVERAGE.md "table-format MERGE" seam), and the
    * semantics above are what it must preserve. */
  def mergeInto(baseDir: String, source: DataFrame, keys: Seq[String],
      whenMatched: MatchedAction, insertUnmatched: Boolean,
      marker: String, retain: Int = 2): Long = {
    require(keys.nonEmpty, "MERGE needs at least one key column")
    val spark = source.sparkSession
    // reject multi-match sources: count per key via one window over the
    // (typically batch-sized) source, fail the job on any duplicate
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    val uniqueSource = source
      .withColumn("__kn", count(lit(1)).over(w))
      .withColumn("__chk", assert_true(col("__kn") === 1,
        lit(s"MERGE source has multiple rows for a (${keys.mkString(",")}) key")))
      .filter(col("__chk").isNull).drop("__kn", "__chk")
    val result = read(spark, baseDir) match {
      case None =>
        if (insertUnmatched) uniqueSource else uniqueSource.limit(0)
      case Some(target) =>
        // name AND type parity: a name-only check would let a type-drifted
        // source slide into a confusing analysis error (or a silently
        // widened column) deep inside publish
        def sig(df: DataFrame): Seq[(String, String)] =
          df.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq.sortBy(_._1)
        require(sig(target) == sig(source),
          s"MERGE source schema ${sig(source).mkString(",")} must match " +
            s"snapshot schema ${sig(target).mkString(",")}")
        val src = uniqueSource.select(target.columns.map(col).toIndexedSeq: _*)
        val untouched = target.join(src.select(keys.map(col): _*), keys, "left_anti")
        val fromSource = (whenMatched, insertUnmatched) match {
          case (UpdateMatched, true) => src // upsert: every source row lands
          case (UpdateMatched, false) =>
            src.join(target.select(keys.map(col): _*), keys, "left_semi")
          case (DeleteMatched, true) =>
            src.join(target.select(keys.map(col): _*), keys, "left_anti")
          case (DeleteMatched, false) => src.limit(0)
        }
        untouched.unionByName(fromSource)
    }
    publish(result, baseDir, marker, retain)
  }

  /** One MERGE INTO cycle driven by a micro-batch — [[mergeInto]] with
    * the same checkpoint-lineage replay skip as [[mergeBatch]]: a
    * restarted stream re-delivering an already-applied batch id leaves
    * the snapshot untouched (the marker records (tag, batchId), and the
    * pointer flip made it atomic), so the sink is effectively-once. The
    * batch is first reduced to ONE row per key — last writer by
    * `orderCol` wins, the standard CDC convention — because a micro-batch
    * can legally carry several updates for one key while MERGE requires
    * unique source keys. */
  private[graft] def mergeIntoBatch(batch: DataFrame, keys: Seq[String],
      orderCol: String, baseDir: String, checkpointTag: String,
      batchId: Long, whenMatched: MatchedAction = UpdateMatched,
      retain: Int = 2): Unit = {
    val spark = batch.sparkSession
    val (tag, lastId) = lastApplied(spark, baseDir)
    if (!(tag == checkpointTag && lastId >= batchId)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(col(orderCol).desc)
      val latest = batch
        .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", orderCol)
      mergeInto(baseDir, latest, keys, whenMatched,
        insertUnmatched = true, marker = s"$checkpointTag:$batchId", retain = retain)
      ()
    }
  }

  /** Streaming CDC-upsert sink: maintain a keyed table from a stream of
    * row versions via MERGE INTO per micro-batch — the streaming
    * counterpart of a warehouse `MERGE` pipeline. Latest row per key
    * wins within a batch (by `orderCol`); across batches the snapshot's
    * pointer commit + lineage marker give effectively-once apply. */
  def mergeSink(updates: DataFrame, keys: Seq[String], orderCol: String,
      baseDir: String, checkpoint: String, retain: Int = 2)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeIntoBatch(batch, keys, orderCol, baseDir,
          checkpointTag = checkpoint, batchId = batchId, retain = retain)
      }

  /** One merge cycle against the versioned snapshot — the
    * [[StreamingKpis.mergeBatchIntoSnapshot]] logic (mergeable
    * (count,sum,min,max) partials, checkpoint-lineage-scoped replay skip)
    * re-based on [[publish]]'s pointer commit. */
  private[graft] def mergeBatch(batch: DataFrame, keys: Seq[String],
      valueCol: String, baseDir: String, checkpointTag: String,
      batchId: Long, retain: Int = 2): Unit = {
    val spark = batch.sparkSession
    val (tag, lastId) = lastApplied(spark, baseDir)
    if (!(tag == checkpointTag && lastId >= batchId)) {
      val partial = graft.operators.Incremental.partials(batch, keys, col(valueCol))
      val merged = read(spark, baseDir) match {
        case Some(snap) => graft.operators.Incremental.merge(Seq(snap, partial), keys)
        case None => partial
      }
      publish(merged, baseDir, s"$checkpointTag:$batchId", retain)
    }
  }

  /** Streaming sink: maintain the versioned snapshot from a stream of new
    * rows — [[StreamingKpis.incrementalSnapshot]] with the pointer commit
    * in place of the rename-swap. */
  def sink(events: DataFrame, keys: Seq[String], valueCol: String,
      baseDir: String, checkpoint: String, retain: Int = 2)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, keys, valueCol, baseDir,
          checkpointTag = checkpoint, batchId = batchId, retain = retain)
      }
}
