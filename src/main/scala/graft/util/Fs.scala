package graft.util

/** Single home for the recursive-delete helper. Three call sites (Bench's
  * shutdown hook, Verify's stale-dump removal, q19's temp-table cleanup)
  * each carried a private copy — and drifted private copies of shared
  * helpers have forked behavior in this repo before (see SplitMix's
  * scaladoc). Keep exactly one definition.
  */
object Fs {
  /** Best-effort recursive delete that does NOT follow symlinks: a
    * directory symlink inside the tree is deleted as a link, never
    * descended — File.listFiles RESOLVES a symlink child and lists the
    * TARGET's contents, so unguarded recursion deletes files outside
    * the tree through the link (empirically confirmed; the callers pass
    * user-supplied paths like Verify's outDir, where that is data
    * loss). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
