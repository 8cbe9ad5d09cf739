package graft.ops

/** Local-filesystem helpers for the tooling/test seams (warehouse resets,
  * versioned-state retention). Production data paths go through Hadoop
  * FileSystem via Spark's own writers — this is only for driver-local
  * directories the engine itself created. */
object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }
}
