package graft.sink

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Fault-injecting local filesystem for crash soaks: a `chaos:` scheme over
  * the local disk whose MUTATING operations (create/mkdirs/rename/delete)
  * throw once an armed countdown reaches zero — and keep throwing until
  * disarmed, modeling a process that died mid-maintenance and can only be
  * observed again after "restart" (disarm + re-run). Reads stay healthy
  * throughout: the disk survives the crash, the writer doesn't.
  *
  * Registered per test via `fs.chaos.impl`; the countdown is JVM-global
  * (local-mode executors share it). */
class ChaosFs extends RawLocalFileSystem {
  override def getScheme: String = "chaos"
  override def getUri: URI = URI.create("chaos:///")

  override def rename(src: Path, dst: Path): Boolean = {
    ChaosFs.tick(); super.rename(src, dst)
  }
  override def delete(p: Path, recursive: Boolean): Boolean = {
    ChaosFs.tick(); super.delete(p, recursive)
  }
  override def mkdirs(f: Path): Boolean = {
    ChaosFs.tick(); super.mkdirs(f)
  }
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    ChaosFs.tick()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize,
      progress)
  }
}

object ChaosFs {
  /** Mutations remaining before the injected crash; MaxValue = disarmed. */
  private val remaining = new AtomicInteger(Int.MaxValue)

  /** Total mutations observed (for sizing random kill points). */
  val mutations = new AtomicLong(0)

  def arm(afterOps: Int): Unit = remaining.set(afterOps)
  def disarm(): Unit = remaining.set(Int.MaxValue)

  private[sink] def tick(): Unit = {
    mutations.incrementAndGet()
    if (remaining.decrementAndGet() <= 0)
      throw new IOException("chaos: injected crash")
  }
}
