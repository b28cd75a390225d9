package graft.util

import java.io.File

/** Local-filesystem helpers for the staging/warehouse paths the tests and
  * local sinks manage (executors never touch these at scale — cluster
  * writes go through the file commit protocol).
  */
object Fs {
  /** Recursive delete; tolerates missing paths and unreadable dirs
    * (listFiles null).
    */
  def deleteRecursively(path: String): Unit = {
    def rec(f: File): Unit = {
      if (f.isDirectory) {
        val children = f.listFiles()
        if (children != null) children.foreach(rec)
      }
      f.delete(): Unit
    }
    val f = new File(path)
    if (f.exists()) rec(f)
  }
}
