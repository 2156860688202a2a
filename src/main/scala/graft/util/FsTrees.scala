package graft.util

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Local-FS tree cloning via hardlinks — the cheap way to hand each of
  * many consumers a PRIVATE, mutable copy of one immutable staged
  * dataset. A hardlink clone costs one directory entry per file (no data
  * bytes move); the consumer may delete or overwrite its links freely
  * (parquet files are immutable-once-written in every op in this repo —
  * rewrites replace files, never append to them — so a link can never
  * observe a mutation of the canonical copy). Falls back to a byte copy
  * when the filesystem refuses links (cross-device, exotic mounts).
  */
object FsTrees {

  /** Clone `src` into `dst` (created; must not already exist — callers
    * delete their previous pass's copy first, which keeps the contract
    * obvious). Returns the number of files linked/copied.
    */
  def linkTree(src: String, dst: String): Int = {
    val s = Paths.get(src)
    val d = Paths.get(dst)
    require(Files.isDirectory(s), s"linkTree source missing: $src")
    require(!Files.exists(d), s"linkTree destination exists: $dst")
    var n = 0
    val stream = Files.walk(s)
    try {
      stream.iterator().asScala.foreach { p =>
        val t = d.resolve(s.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          try Files.createLink(t, p)
          catch {
            case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
              Files.copy(p, t, StandardCopyOption.COPY_ATTRIBUTES)
          }
          n += 1
        }
      }
    } finally stream.close()
    n
  }

  /** Delete `p` recursively if it exists (no-op otherwise). */
  def deleteTree(p: String): Unit = {
    def rec(x: Path): Unit = {
      if (Files.isDirectory(x, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val stream = Files.list(x)
        try stream.iterator().asScala.toSeq.foreach(rec)
        finally stream.close()
      }
      Files.deleteIfExists(x); ()
    }
    rec(Paths.get(p))
  }
}
