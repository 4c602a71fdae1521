package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

/** FileIO with OBJECT-STORE semantics (reference: paimon-filesystems'
  * S3/OSS wrappers and FileStoreCommitImpl's conditional-write commit
  * path). A 100 TB deployment lives on object storage, whose contract
  * differs from a local/HDFS filesystem in exactly the ways that break
  * naive table formats:
  *
  *  - a PUT is ATOMIC per object (readers see the old or the new blob,
  *    never a torn write) — so there is NO tmp-file + rename dance;
  *  - there is NO atomic rename: rename is COPY + DELETE, and a crash
  *    between the two leaves both objects — nothing in the commit
  *    protocol may depend on rename atomicity;
  *  - create-if-absent is a CONDITIONAL PUT (`If-None-Match: *`),
  *    which is the single primitive the snapshot CAS needs;
  *  - "directories" are key prefixes: mkdirs is a no-op;
  *  - a conditional PUT can LAND while its response is lost (client
  *    timeout after the server applied it) — committers must detect
  *    their own landed snapshot instead of double-committing.
  *
  * Storage is backed by the local filesystem (so Spark-written data
  * files and this metadata share one table root) while the SEMANTIC
  * surface is the object-store one, plus injectable faults for the
  * robustness specs:
  *
  *  - [[Faults.duplicatePuts]]: every PUT is applied twice (an
  *    at-least-once retry storm — metadata writes must be idempotent);
  *  - [[Faults.lostPutResponses]]: the next N conditional PUTs land
  *    but REPORT failure (the lost-200 case above);
  *  - [[Faults.failRenameDeletes]]: the next N renames copy the object
  *    but crash before deleting the source (the lost-rename case —
  *    callers must tolerate the source lingering; orphan cleanup
  *    reclaims it);
  *  - [[Faults.staleListMillis]]: LIST hides objects younger than the
  *    window (list-after-write lag) — discovery paths must use the
  *    LATEST hint + point reads (`exists`), never trust LIST freshness.
  */
final class ObjectStoreFileIO(
    val faults: ObjectStoreFileIO.Faults = ObjectStoreFileIO.Faults())
  extends FileIO {

  private def p(s: String): Path = Paths.get(s)

  override def readString(path: String): String =
    new String(readBytes(path), StandardCharsets.UTF_8)

  override def readBytes(path: String): Array[Byte] =
    Files.readAllBytes(p(path))

  /** One atomic PUT (emulated with an ATOMIC_MOVE onto the key, which
    * gives the same readers-see-whole-objects guarantee). */
  private def put(path: String, content: Array[Byte]): Unit = {
    Files.createDirectories(p(path).getParent)
    val tmp = p(path + ".put." + java.util.UUID.randomUUID())
    Files.write(tmp, content)
    Files.move(tmp, p(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def writeString(path: String, content: String): Unit =
    writeBytes(path, content.getBytes(StandardCharsets.UTF_8))

  override def writeBytes(path: String, content: Array[Byte]): Unit = {
    put(path, content)
    if (faults.duplicatePuts) put(path, content) // at-least-once retry
  }

  /** Conditional PUT (`If-None-Match: *`): the snapshot CAS. Staged as
    * tmp + hard link onto the key: link(2) is atomic AND fails with
    * EEXIST when the target exists (a rename would silently replace on
    * POSIX), so the object appears whole or not at all — a concurrent
    * reader (e.g. SnapshotManager's lost-response recheck doing
    * exists() then snapshot(id)) must never see torn JSON, the same
    * PUT contract put() upholds. */
  override def tryCreateAtomic(path: String, content: String): Boolean = {
    Files.createDirectories(p(path).getParent)
    val tmp = p(path + ".cput." + java.util.UUID.randomUUID())
    try {
      // inside the try so a failed tmp write is also swept by the
      // finally (a leaked .cput. file is filtered from listings but
      // would accumulate as orphan debris)
      Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
      Files.createLink(p(path), tmp)
      if (faults.lostPutResponses.getAndUpdate(n => math.max(0, n - 1)) > 0)
        false // the object LANDED; the caller saw a timeout
      else true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  override def exists(path: String): Boolean = Files.exists(p(path))

  /** Keys are flat; prefixes need no creation. */
  override def mkdirs(path: String): Unit = ()

  override def list(dir: String): Seq[String] =
    if (!Files.isDirectory(p(dir))) Seq.empty
    else {
      val all = FsUtil.listAll(p(dir))
      val lag = faults.staleListMillis.get()
      val visible =
        if (lag <= 0L) all
        else {
          val cutoff = System.currentTimeMillis() - lag
          all.filter(f =>
            !Files.isRegularFile(f) ||
              Files.getLastModifiedTime(f).toMillis <= cutoff)
        }
      visible.map(_.toString)
    }

  override def delete(path: String): Unit = Files.deleteIfExists(p(path))

  /** COPY + DELETE — the object-store "rename". NOT atomic: with the
    * fault armed, the copy lands and the source survives (the caller's
    * crash-between case). */
  override def rename(src: String, dst: String): Unit = {
    // STREAMING copy-then-put: materializing the source via
    // readAllBytes would hold a whole multi-hundred-MB staged data
    // file on the heap per adopted file (commitStagedDir routes every
    // staged file through rename). Same PUT shape: tmp + atomic move,
    // the object appears whole or not at all.
    Files.createDirectories(p(dst).getParent)
    val tmp = p(dst + ".put." + java.util.UUID.randomUUID())
    Files.copy(p(src), tmp)
    Files.move(tmp, p(dst), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    if (faults.failRenameDeletes.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.io.IOException(
        s"injected fault: rename copied $src to $dst but crashed before delete")
    Files.deleteIfExists(p(src))
  }
}

object ObjectStoreFileIO {
  /** Injectable fault switches, all off by default. Counters are
    * one-shot budgets (each firing decrements). */
  final case class Faults(
      duplicatePuts: Boolean = false,
      lostPutResponses: AtomicInteger = new AtomicInteger(0),
      failRenameDeletes: AtomicInteger = new AtomicInteger(0),
      staleListMillis: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(0L))
}
