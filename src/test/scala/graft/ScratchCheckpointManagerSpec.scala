package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ScratchCheckpointFileManager

/** Routing contract of the path-scoped in-heap checkpoint manager
  * (round-15 self-review asked for direct coverage of the delegation
  * layer): claimed roots live in the heap map and touch no filesystem;
  * unclaimed paths behave exactly like the default manager (real
  * files); release() stops routing, drops the tree, and a straggler
  * stream closing afterwards must NOT re-insert; a pre-existing custom
  * manager class chains through the delegate instead of being
  * discarded. */
class ScratchCheckpointManagerSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d
  }

  private def writeVia(
      m: ScratchCheckpointFileManager, p: Path, bytes: Array[Byte]): Unit = {
    val out = m.createAtomic(p, overwriteIfPossible = true)
    out.write(bytes)
    out.close()
  }

  test("claimed root: in-heap round-trip, nothing on disk; release drops") {
    val root = tmpDir("scratch_claimed")
    val rootPath = root.getAbsolutePath
    ScratchCheckpointFileManager.claim(rootPath)
    try {
      val m = new ScratchCheckpointFileManager(
        new Path(rootPath), new Configuration())
      val f = new Path(s"$rootPath/offsets/0")
      writeVia(m, f, "offsets-payload".getBytes("UTF-8"))
      assert(m.exists(f))
      val in = m.open(f)
      val got = new String(in.readAllBytes(), "UTF-8")
      in.close()
      assert(got == "offsets-payload")
      // list sees the child through the in-heap tree
      val kids = m.list(new Path(s"$rootPath/offsets"))
      assert(kids.map(_.getPath.getName).toSeq == Seq("0"))
      // the filesystem saw NOTHING
      assert(new java.io.File(root, "offsets").exists() == false)
      // atomic-create contract: second no-overwrite create fails at close
      val dup = m.createAtomic(f, overwriteIfPossible = false)
      dup.write("x".getBytes)
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException](dup.close())
    } finally ScratchCheckpointFileManager.release(rootPath)
    // after release the entry is gone (fresh manager, root re-claimed)
    ScratchCheckpointFileManager.claim(rootPath)
    try {
      val m2 = new ScratchCheckpointFileManager(
        new Path(rootPath), new Configuration())
      assert(!m2.exists(new Path(s"$rootPath/offsets/0")))
    } finally ScratchCheckpointFileManager.release(rootPath)
  }

  test("straggler close after release does not re-insert") {
    val root = tmpDir("scratch_straggler")
    val rootPath = root.getAbsolutePath
    ScratchCheckpointFileManager.claim(rootPath)
    val m = new ScratchCheckpointFileManager(
      new Path(rootPath), new Configuration())
    val f = new Path(s"$rootPath/state/1.delta")
    val straggler = m.createAtomic(f, overwriteIfPossible = true)
    straggler.write("late".getBytes)
    ScratchCheckpointFileManager.release(rootPath)
    straggler.close() // lands after release: must be dropped
    ScratchCheckpointFileManager.claim(rootPath)
    try assert(!m.exists(f))
    finally ScratchCheckpointFileManager.release(rootPath)
  }

  test("unclaimed path delegates to a real filesystem manager") {
    val other = tmpDir("scratch_unclaimed")
    val m = new ScratchCheckpointFileManager(
      new Path(other.getAbsolutePath), new Configuration())
    val f = new Path(s"${other.getAbsolutePath}/metadata")
    writeVia(m, f, "durable".getBytes("UTF-8"))
    // the bytes are REAL files, not heap entries
    val onDisk = new java.io.File(other, "metadata")
    assert(onDisk.exists(),
      "unclaimed write must reach the filesystem via the delegate")
    val in = m.open(f)
    assert(new String(in.readAllBytes(), "UTF-8") == "durable")
    in.close()
    assert(m.list(new Path(other.getAbsolutePath))
      .exists(_.getPath.getName == "metadata"))
  }

  test("delegate chains to a stashed custom manager class") {
    val other = tmpDir("scratch_chain")
    val conf = new Configuration()
    conf.set(ScratchCheckpointFileManager.DelegateKey,
      classOf[RecordingManager].getName)
    val m = new ScratchCheckpointFileManager(
      new Path(other.getAbsolutePath), conf)
    RecordingManager.instantiated.set(0)
    m.exists(new Path(s"${other.getAbsolutePath}/x")) // forces the delegate
    assert(RecordingManager.instantiated.get() == 1,
      "the stashed custom manager class must be the delegate")
  }
}

/** Minimal custom manager standing in for a user-configured one. */
class RecordingManager(root: Path, conf: Configuration)
    extends org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager {
  RecordingManager.instantiated.incrementAndGet()
  import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream
  override def createAtomic(p: Path, o: Boolean): CancellableFSDataOutputStream = ???
  override def open(p: Path): org.apache.hadoop.fs.FSDataInputStream = ???
  override def list(p: Path, f: org.apache.hadoop.fs.PathFilter): Array[org.apache.hadoop.fs.FileStatus] = Array.empty
  override def mkdirs(p: Path): Unit = ()
  override def exists(p: Path): Boolean = false
  override def delete(p: Path): Unit = ()
  override def isLocal: Boolean = true
  override def createCheckpointDirectory(): Path = root
}

object RecordingManager {
  val instantiated = new java.util.concurrent.atomic.AtomicInteger(0)
}
