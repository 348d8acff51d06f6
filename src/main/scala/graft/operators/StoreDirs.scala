package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions

/** Canonical on-disk locations for the materialized stores
  * ([[LabelStore]], [[IvfStore]]) plus the shared "temp store scoped to
  * one query" lifecycle the maintenance-gate rows use.
  */
private[graft] object StoreDirs {

  /** Stable per-corpus store path under the system tmpdir.
    *
    * The key is the sanitized corpus path PLUS an md5 of the raw path:
    * sanitization alone maps distinct dirs (`/a/b`, `/a_b`) to one key,
    * and a key derivable from the corpus path alone is pre-creatable by
    * another local user under the world-writable tmpdir (ADVICE r9). The
    * hash disambiguates collisions; owner-only permissions on the root
    * (best-effort — non-POSIX filesystems skip) close the pre-seeding
    * window: if the root already exists but is not ours, creation of our
    * subdirectories inside a 0700 dir we don't own fails loudly rather
    * than serving someone else's generations.
    */
  def canonical(family: String, dir: String): String = {
    val sanitized = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val root = Paths.get(sys.props("java.io.tmpdir"), family)
    ownerOnlyDir(root)
    s"$root/$sanitized-$digest"
  }

  private def ownerOnlyDir(p: Path): Unit =
    try {
      if (!Files.exists(p))
        Files.createDirectories(p,
          PosixFilePermissions.asFileAttribute(PosixFilePermissions.fromString("rwx------")))
    } catch {
      case _: UnsupportedOperationException => Files.createDirectories(p)
    }

  /** Free a `localCheckpoint`'d frame's pinned blocks — the shared
    * exit discipline of every maintenance/ingest path that pins a
    * per-call frame (the clusterPairs lesson: orphaned checkpoint
    * blocks accumulate across calls until later phases pay for them in
    * memory pressure). Unpersists exactly the frame's own LogicalRDD
    * leaves, nothing a concurrent writer may have materialized.
    */
  def freePinned(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Run `body` against a fresh throwaway store, then DELETE the store
    * once the caller has pinned everything it needs (ADVICE r9: the
    * maintenance-gate rows created a full index copy per invocation and
    * the bench invokes each row N times — the copies accumulated for the
    * life of the tmpdir). The caller must localCheckpoint/collect its
    * result BEFORE returning: the store files are gone when this exits.
    */
  def withTempStore[A](prefix: String)(body: String => A): A = {
    val root = Files.createTempDirectory(prefix)
    try body(s"$root/store")
    finally deleteRecursively(root)
  }

  /** True iff `root` holds at least one `__batch=<j>` child. The batch
    * datasets (tombstones especially) can exist as a DIRECTORY with no
    * data in two legitimate states — a crash before any partition
    * committed (only `_temporary` inside) and a publish-time GC that
    * deleted the last batch (only `_SUCCESS` left) — and a parquet read
    * of either throws schema-inference errors, bricking every later
    * maintenance call on a store that is perfectly healthy. Readers
    * must treat "dir without batches" exactly like "dir absent".
    */
  def hasBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
                   root: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(root) && fs.listStatus(root).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("__batch="))

  /** Delete `.gen…retired` debris left by EARLIER publishes. Retirement
    * is a dot-rename (not a delete) so a reader that resolved a
    * generation path just before the publish still scans existing files;
    * but without a later sweep the renamed dirs live forever — on a
    * long-lived store that is an unbounded disk leak (every superseded
    * label table / centroid set / day manifest kept in full). Each
    * publish therefore sweeps the PREVIOUS publishes' retired dirs
    * before retiring its own: the grace window is exactly one publish
    * cycle, matching the two-live-generations reader contract.
    */
  def sweepRetired(fs: org.apache.hadoop.fs.FileSystem,
                   root: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.startsWith(".") && nm.endsWith(".retired"))
        fs.delete(st.getPath, true)
    }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
}
