package graft.streaming

import java.nio.file.{Files, LinkOption, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/**
 * Exposes a single parquet FILE as a directory for the streaming file
 * source (which only accepts directories), via symlinks with a copy
 * fallback for filesystems without them.
 *
 * The directory is a FIXED location per (prefix, source path, link set):
 * a fresh temp dir per call would leak a dataset copy per run. The key
 * embeds a hash of the FULL source path — a bare `hashCode` could
 * collide across data dirs and silently serve the wrong corpus — plus a
 * readable tail for debuggability. Links are refreshed when stale: a
 * symlink is re-pointed if its target differs, and a fallback copy is
 * re-copied when its mtime no longer matches the source (a regenerated
 * fixture must not keep streaming old bytes).
 */
private[streaming] object StreamDirs {

  def linkedDir(prefix: String, srcFile: Path, names: Seq[String]): String = {
    val src = srcFile.toAbsolutePath.normalize()
    val digest = MessageDigest.getInstance("MD5")
      .digest(src.toString.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val tail = src.toString.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(40)
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${tail}_${digest}_${names.size}")
    Files.createDirectories(tmp)
    names.foreach { name =>
      val link = tmp.resolve(name)
      val stale =
        if (!Files.exists(link, LinkOption.NOFOLLOW_LINKS)) true
        else if (Files.isSymbolicLink(link)) Files.readSymbolicLink(link) != src
        else Files.getLastModifiedTime(link) != Files.getLastModifiedTime(src)
      if (stale) {
        Files.deleteIfExists(link)
        try Files.createSymbolicLink(link, src)
        catch { case _: Exception =>
          // COPY_ATTRIBUTES preserves the source mtime, making the
          // staleness check above exact for the copy fallback too
          Files.copy(src, link, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.COPY_ATTRIBUTES)
        }
      }
    }
    tmp.toString
  }
}
