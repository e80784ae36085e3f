package graft

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** Scratch-directory + corpus-fingerprint helpers shared by the per-JVM
  * "build once, probe forever" memos (graph label store, landed ANN
  * index, landed retrieval index). Two hazards of a naive
  * `createTempDirectory` memo keyed on the corpus dir alone:
  *
  *  1. the temp dirs are never deleted — a long-lived JVM (notebook,
  *     thrift server) leaks one store per corpus per build variant;
  *  2. if the corpus at that path is REGENERATED within one JVM
  *     lifetime, the memo silently serves labels/codes built from the
  *     old bytes.
  *
  * [[scratchDir]] registers every dir with one shutdown hook that
  * deletes them recursively; [[fingerprint]] folds the corpus dir's
  * file names, sizes and mtimes into the memo key so a regenerated
  * corpus misses the memo and rebuilds.
  */
object TempStores {
  private val created = mutable.ArrayBuffer.empty[Path]
  private lazy val hook: Unit = // lazy: register the hook exactly once
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized(created.foreach(deleteRecursively))))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    try Files.deleteIfExists(p) catch { case _: Throwable => () }
  }

  /** A temp directory cleaned up at JVM exit. */
  def scratchDir(prefix: String): String = {
    hook
    val d = Files.createTempDirectory(prefix)
    created.synchronized(created += d)
    d.toString
  }

  /** Cheap content fingerprint of a corpus directory: a 64-bit FNV-1a
    * fold over every regular file's (relative name, size, mtime-millis),
    * visited in sorted order. Metadata-only — no data bytes are read —
    * which catches the regeneration case (any rewrite bumps mtime) at
    * O(files) stat calls. */
  def fingerprint(dir: String): String = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return "absent"
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit =
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    val files = Files.walk(root).iterator()
    val entries = mutable.ArrayBuffer.empty[String]
    while (files.hasNext) {
      val p = files.next()
      if (Files.isRegularFile(p))
        entries += s"${root.relativize(p)}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"
    }
    entries.sorted.foreach(mix)
    java.lang.Long.toHexString(h)
  }
}
