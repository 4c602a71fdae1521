package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Thin filesystem abstraction for metadata IO.
  *
  * The commit protocol needs exactly one primitive beyond read/write:
  * atomic create-if-absent of the snapshot file (the CAS that
  * serializes concurrent committers — model:
  * paimon-core .../operation/FileStoreCommitImpl.java tryCommit loop).
  * The local implementation stages tmp + hard-links onto the target
  * (atomic no-replace WITH atomic content visibility); an object-store
  * implementation would use conditional PUT, an HDFS one rename().
  */
/** `Files.list`/`Files.walk` return streams backed by an OPEN
  * directory handle — dropping them without close() leaks one fd per
  * call, which exhausts a long-running driver (schema reads list the
  * directory on every table operation). These helpers materialize and
  * close. */
object FsUtil {
  def listAll(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toList finally s.close()
  }
  def walkAll(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toList finally s.close()
  }
}

trait FileIO extends Serializable {
  def readString(path: String): String
  def writeString(path: String, content: String): Unit
  def readBytes(path: String): Array[Byte]
  def writeBytes(path: String, content: Array[Byte]): Unit
  /** Atomically create `path` with `content` iff it does not exist.
    * @return true on success, false if the path already exists. */
  def tryCreateAtomic(path: String, content: String): Boolean
  def exists(path: String): Boolean
  def mkdirs(path: String): Unit
  def list(dir: String): Seq[String]
  def delete(path: String): Unit
  def rename(src: String, dst: String): Unit
  /** File size in bytes; the default reads the file — backends with a
    * cheap stat should override. */
  def size(path: String): Long = readBytes(path).length.toLong
}

final class LocalFileIO extends FileIO {
  private def p(s: String): Path = Paths.get(s)

  override def readString(path: String): String =
    new String(Files.readAllBytes(p(path)), StandardCharsets.UTF_8)

  override def writeString(path: String, content: String): Unit = {
    Files.createDirectories(p(path).getParent)
    val tmp = p(path + ".tmp." + java.util.UUID.randomUUID())
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def readBytes(path: String): Array[Byte] =
    Files.readAllBytes(p(path))

  override def writeBytes(path: String, content: Array[Byte]): Unit = {
    Files.createDirectories(p(path).getParent)
    val tmp = p(path + ".tmp." + java.util.UUID.randomUUID())
    Files.write(tmp, content)
    Files.move(tmp, p(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Atomic create-if-absent WITH atomic content visibility: staged as
    * tmp + hard link onto the target. link(2) is atomic and fails with
    * EEXIST when the target exists, and the target appears with its
    * full content or not at all — a CREATE_NEW open would make the
    * path visible EMPTY before the write lands, so a concurrent
    * committer's exists()→readString() could parse torn JSON (observed
    * as a Jackson end-of-input failure under 4-way commit races). */
  override def tryCreateAtomic(path: String, content: String): Boolean = {
    Files.createDirectories(p(path).getParent)
    val tmp = p(path + ".tmp." + java.util.UUID.randomUUID())
    try {
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      Files.createLink(p(path), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      // no-hardlink filesystems surface as UnsupportedOperationException
      // on some providers but as a generic FileSystemException
      // (EPERM/EOPNOTSUPP from link(2)) on the JDK unix provider —
      // catch both, re-verify the target doesn't exist (losing the race
      // is still `false`, not an error), and fall back to CREATE_NEW
      // (CAS still correct; content visibility only best-effort there)
      case _: UnsupportedOperationException |
           _: java.nio.file.FileSystemException =>
        if (Files.exists(p(path))) false
        else
          try {
            Files.write(p(path), content.getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
    } finally Files.deleteIfExists(tmp)
  }

  override def exists(path: String): Boolean = Files.exists(p(path))
  override def size(path: String): Long = Files.size(p(path))

  override def mkdirs(path: String): Unit = Files.createDirectories(p(path))

  override def list(dir: String): Seq[String] =
    if (!Files.isDirectory(p(dir))) Seq.empty
    else FsUtil.listAll(p(dir)).map(_.toString)

  override def delete(path: String): Unit = Files.deleteIfExists(p(path))

  override def rename(src: String, dst: String): Unit = {
    Files.createDirectories(p(dst).getParent)
    Files.move(p(src), p(dst), StandardCopyOption.ATOMIC_MOVE)
  }
}
