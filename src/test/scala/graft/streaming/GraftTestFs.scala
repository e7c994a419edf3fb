package graft.streaming

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

/** A local filesystem registered under the NON-`file:` scheme `graftfs`
  * — the test double that forces [[VersionedSnapshot]]'s HDFS-shaped
  * branches, which `file:` paths can never reach: `tryCreateNew`'s
  * `createNewFile` (server-side create-if-absent) instead of NIO
  * O_EXCL, and `atomicOverwrite`'s FileContext rename-with-OVERWRITE
  * instead of the NIO ATOMIC_MOVE. Raw local underneath (no checksum
  * sidecars — like HDFS, where checksums are internal), so the
  * semantics match what the non-`file:` code paths are written for. */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** The AbstractFileSystem face of [[GraftTestFileSystem]] — what
  * `FileContext.getFileContext(uri, conf)` resolves through
  * `fs.AbstractFileSystem.graftfs.impl` (the same delegation shape
  * Hadoop's own RawLocalFs uses for `file:`). */
class GraftTestAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftTestFileSystem, conf, "graftfs", false)
