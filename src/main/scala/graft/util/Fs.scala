package graft.util

/** Single home for the recursive-delete helper. Three call sites (Bench's
  * shutdown hook, Verify's stale-dump removal, q19's temp-table cleanup)
  * each carried a private copy — and drifted private copies of shared
  * helpers have forked behavior in this repo before (see SplitMix's
  * scaladoc). Keep exactly one definition.
  */
object Fs {
  /** Best-effort recursive delete; does not follow symlinks out of the
    * tree (listFiles returns the link itself, delete removes the link). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
