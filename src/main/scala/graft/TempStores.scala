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
    // close the listing stream before deleting: an unclosed Files.list
    // holds a directory handle until GC, and this runs once per scratch
    // dir per JVM exit AND from long-lived sessions' cleanup paths
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively) finally children.close()
    }
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
    * fold over every regular file's (relative name, size, mtime-millis)
    * PLUS a 64-byte head and tail byte sample per file, visited in
    * sorted order. The byte samples close the metadata-only hazard
    * (ADVICE r12): a corpus regenerated with identical file sizes
    * inside the filesystem's mtime granularity would fingerprint equal
    * on metadata alone and silently serve a stale memoized store.
    * Parquet head/tail bytes cover the magic + footer (row-group
    * offsets, column stats), which any data rewrite perturbs. Cost is
    * O(files) stats + two tiny pread()s per file — still safe to run
    * on every memoized-operator call. */
  def fingerprint(dir: String): String = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return "absent"
    var h = 0xcbf29ce484222325L
    def mixBytes(bs: Array[Byte], n: Int): Unit = {
      var i = 0
      while (i < n) { h ^= (bs(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    }
    def mix(s: String): Unit = mixBytes(s.getBytes("UTF-8"), s.getBytes("UTF-8").length)
    val walk = Files.walk(root)
    val entries = mutable.ArrayBuffer.empty[Path]
    try {
      val files = walk.iterator()
      while (files.hasNext) {
        val p = files.next()
        if (Files.isRegularFile(p)) entries += p
      }
    } finally walk.close()
    entries.sortBy(p => root.relativize(p).toString).foreach { p =>
      mix(s"${root.relativize(p)}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}")
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.READ)
      try {
        val sz = ch.size()
        val head = java.nio.ByteBuffer.allocate(64)
        val nh = ch.read(head, 0L)
        if (nh > 0) mixBytes(head.array(), nh)
        if (sz > 64) {
          val tail = java.nio.ByteBuffer.allocate(64)
          val nt = ch.read(tail, math.max(64L, sz - 64))
          if (nt > 0) mixBytes(tail.array(), nt)
        }
      } finally ch.close()
    }
    java.lang.Long.toHexString(h)
  }
}
