package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Scratch-cache lifecycle for multi-stage compositions (r14).
  *
  * The repo's convention is per-query persists released by the
  * harness's `catalog.clearCache()` between queries. That convention
  * breaks inside ONE long composition: pp01 chains nine stages whose
  * kernels (globalRank/globalCumsum's ranged relation, the dedup
  * shingle index, decontaminate's shingle explode, the CC label
  * iteration) each persist corpus-sized scratch that is DEAD the
  * moment the stage's output materializes — but lived to the end of
  * the run (r13 advisor: stage 6's blocks leaked; the sibling scratch
  * relations leaked the same way, they were just never flagged).
  *
  * A scope is a dynamic extent: kernels `track` their scratch
  * persists; the composition opens a `scoped { build + materialize }`
  * per stage and every tracked frame is unpersisted when the scope
  * closes. With NO scope open, `track` is a no-op — standalone query
  * entries keep the old harness-cleared behavior unchanged.
  *
  * Thread-local by design: Spark plan building and driver-side
  * actions for one composition run on the calling thread. Scratch
  * tracked by a task thread would not see the scope — nothing in this
  * codebase persists from executor code.
  */
object CacheScope {
  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue: List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Register a persisted scratch frame with the innermost open scope
    * (no-op when none is open). Returns the frame for chaining. */
  def track(df: DataFrame): DataFrame = {
    scopes.get() match {
      case head :: _ => head += df
      case Nil       => ()
    }
    df
  }

  /** Run `body` in a fresh scope; every frame `track`ed during it is
    * unpersisted (non-blocking) when the body finishes — the body must
    * have MATERIALIZED anything it returns (cut or collected), because
    * the scratch it was built from is gone after this returns. */
  def scoped[T](body: => T): T = {
    val buf = ArrayBuffer.empty[DataFrame]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist(blocking = false))
    }
  }
}
