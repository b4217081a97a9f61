package graft.streaming

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** In-heap [[CheckpointFileManager]] for BOUNDED scratch drains.
  *
  * A scratch drain's checkpoint is disposable by construction — the
  * query is created, drained with AvailableNow, and discarded inside
  * one call, and nothing ever resumes from its checkpoint (see
  * [[StreamingOps]]'s scratch-checkpoint scaladoc). Yet every such
  * drain still pays real filesystem round-trips through the default
  * rename-based manager: offset-WAL create+rename+CRC, commit-log
  * ditto, the file-source seen-files log, and one state-store delta
  * file per store per batch — measured ~0.08 s of walCommit+
  * commitOffsets alone per bounded drain at sf0.1, even on /dev/shm.
  * This manager keeps those "files" in a JVM-global map instead:
  * byte-array values, atomic create via buffer-then-put, zero
  * syscalls. [[StreamingOps.withScratchCheckpoint]] activates it ONLY
  * for scratch drains and [[dropTree]]s the map afterwards; deployed
  * continuous queries keep the default durable manager exactly as they
  * keep durable checkpoint directories.
  *
  * Single-JVM scope is inherent and fine here: scratch drains already
  * pin their checkpoint to node-local tmpfs, which is equally invisible
  * across machines. (In local[*] the "executors" share this JVM, so
  * state-store commits land in the same map.) Spark instantiates one
  * manager instance per metadata log via the documented
  * `spark.sql.streaming.checkpointFileManagerClass` conf and the
  * (Path, Configuration) constructor; all instances share the global
  * map, so the offset log, commit log, source log, and state stores
  * see one coherent tree. */
class ScratchCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {
  import ScratchCheckpointFileManager._

  override def createAtomic(
      path: Path, overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val k = key(path)
    registerDirs(parentOf(k))
    new MemOut(k, overwriteIfPossible)
  }

  override def open(path: Path): FSDataInputStream = {
    val bytes = files.get(key(path))
    if (bytes == null)
      throw new java.io.FileNotFoundException(s"scratch-ckpt: ${key(path)}")
    new FSDataInputStream(new SeekableBytes(bytes._1))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val p = key(path)
    val fileKids = files.entrySet().asScala.iterator
      .filter(e => parentOf(e.getKey) == p)
      .map(e => new FileStatus(
        e.getValue._1.length.toLong, false, 1, BlockSize,
        e.getValue._2, new Path(e.getKey)))
    val dirKids = dirs.asScala.iterator
      .filter(d => d != p && parentOf(d) == p)
      .map(d => new FileStatus(0L, true, 1, BlockSize, 0L, new Path(d)))
    (fileKids ++ dirKids).filter(st => filter.accept(st.getPath)).toArray
  }

  override def mkdirs(path: Path): Unit = registerDirs(key(path))

  override def exists(path: Path): Boolean = {
    val k = key(path)
    files.containsKey(k) || dirs.contains(k)
  }

  override def delete(path: Path): Unit = {
    val k = key(path)
    files.remove(k)
    if (dirs.remove(k)) dropTree(k)
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    registerDirs(key(root))
    root
  }
}

object ScratchCheckpointFileManager {
  private val BlockSize = 64L * 1024 * 1024
  /** key -> (bytes, modification time ms); keys are scheme-stripped
    * absolute paths so "file:/x" and "/x" address the same entry. */
  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def key(p: Path): String = {
    val raw = p.toUri.getPath
    if (raw.length > 1 && raw.endsWith("/")) raw.dropRight(1) else raw
  }

  private def parentOf(k: String): String = {
    val i = k.lastIndexOf('/')
    if (i <= 0) "/" else k.substring(0, i)
  }

  private def registerDirs(k: String): Unit = {
    var cur = k
    while (cur != "/" && dirs.add(cur)) cur = parentOf(cur)
  }

  /** Drop every in-heap entry under `root` — called by the scratch
    * wrapper's finally so a drain's map entries never outlive it. */
  def dropTree(root: String): Unit = {
    val prefix = (if (root.endsWith("/")) root.dropRight(1) else root) + "/"
    files.keySet().removeIf(k => k.startsWith(prefix))
    dirs.removeIf(k => k.startsWith(prefix))
  }

  private final class MemOut(
      k: String, overwrite: Boolean,
      buf: ByteArrayOutputStream = new ByteArrayOutputStream(4096))
      extends CancellableFSDataOutputStream(buf) {
    @volatile private var done = false
    override def cancel(): Unit = { done = true; try super.close() catch { case _: Exception => } }
    override def close(): Unit = synchronized {
      if (!done) {
        done = true
        super.close()
        val prev = files.putIfAbsent(k, (buf.toByteArray, System.currentTimeMillis()))
        if (prev != null) {
          if (!overwrite) throw new FileAlreadyExistsException(s"scratch-ckpt: $k")
          files.put(k, (buf.toByteArray, System.currentTimeMillis()))
        }
      }
    }
  }

  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes)
      with org.apache.hadoop.fs.Seekable
      with org.apache.hadoop.fs.PositionedReadable {
    override def seek(pos2: Long): Unit = {
      if (pos2 < 0 || pos2 > bytes.length)
        throw new java.io.EOFException(s"seek $pos2 of ${bytes.length}")
      this.pos = pos2.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException()
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
