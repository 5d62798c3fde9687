package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The COMMIT-PROTOCOL filesystem seam. Every publish in this engine —
  * staged artifact directories ([[Bucketing.atomicStage]]), segmented-
  * index manifests ([[graft.operators.SegmentedIndex]]), zone-map
  * manifest segments ([[ZoneMap]]), versioned view-store manifests
  * ([[graft.operators.Pipeline]]) — reduces to ONE rename. Routing
  * that rename through the Hadoop `FileContext` API (instead of
  * `java.nio.file.Files.move`) makes the protocol portable off the
  * local filesystem: on HDFS `rename` is atomic in the NameNode; on
  * object stores a conditional-put `FileSystem` implementation plugs
  * into the same two calls. On this sandbox the `file:` scheme
  * resolves to the local filesystem, whose rename delegates to
  * POSIX rename(2) — the same atomicity the previous NIO calls had,
  * now behind the portable seam.
  *
  * Listings and recursive deletes stay on `java.io.File` by design:
  * they are maintenance reads with no atomicity contract, and the
  * public APIs take local paths in this sandbox. Only the COMMITS —
  * the operations whose atomicity the crash-safety proofs rest on —
  * go through here.
  */
object Fs {

  private lazy val conf = new Configuration()

  private def path(f: java.io.File): Path = new Path(f.toURI)

  private def ctx(p: Path): FileContext =
    FileContext.getFileContext(p.toUri, conf)

  /** Atomic publish: `src` → `dst`, REFUSING to replace an existing
    * destination. A concurrent committer's win surfaces as
    * `org.apache.hadoop.fs.FileAlreadyExistsException` — callers turn
    * it into adopt-theirs (staged artifacts, where both builders
    * produced the same bytes) or a LOUD lost-update failure (manifest
    * generations, where silently dropping the other writer's commit
    * would lose data). */
  def renameNoReplace(src: java.io.File, dst: java.io.File): Unit =
    ctx(path(src)).rename(path(src), path(dst))

  /** Atomic replace: `src` → `dst`, overwriting an existing `dst` in
    * one step (`Options.Rename.OVERWRITE`; HDFS implements it
    * atomically, local FS via rename(2)). Used ONLY for same-content
    * re-commits — an epoch replay overwriting the manifest it already
    * wrote — never to resolve a race between different contents. */
  def renameReplace(src: java.io.File, dst: java.io.File): Unit =
    ctx(path(src)).rename(path(src), path(dst),
      Options.Rename.OVERWRITE)
}
