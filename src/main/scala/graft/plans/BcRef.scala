package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Broadcast-backed payload handle for heavyweight data referenced by
  * expression trees (the [[LmModelRef]] / [[CentroidsLongRef]] /
  * [[CellsFloatRef]] model payloads) — optimization round 17,
  * guide §1.2 step 2 / §5.
  *
  * Why: a model held STRUCTURALLY inside an expression rides the
  * task binary, so every TASK re-deserializes the whole payload
  * (Spark deserializes the broadcast task bytes per task, not per
  * executor), and any per-instance `@transient lazy` mirror is
  * rebuilt per task on top. That per-task tax is what forced the
  * round-16 fan-out opt-outs for the fat-literal query family
  * (q_pq +21 CPU-s at 32 tasks; q_perplexity5_bcast 1.9 → 4.0
  * CPU-s). A `Broadcast` stub serializes in O(1); the value is
  * fetched from the local block store and deserialized AT MOST once
  * per executor JVM — in local mode `value` returns the very object
  * the driver built, zero copies.
  *
  * Plan-identity is NOT affected: the owning ref classes keep their
  * content-digest equality (computed eagerly on the driver before
  * the payload is handed here), so two independently built equal
  * models still compare `sameResult` — the PersistSlots reuse
  * contract — regardless of broadcast instance identity.
  *
  * No-session fallback (pure unit tests, model built before any
  * SparkSession): the value is carried inline, exactly the
  * pre-round-17 behavior. Lifecycle: the ContextCleaner removes a
  * broadcast only once the `Broadcast` object is unreachable, and
  * this handle holds a strong reference for as long as any plan
  * (cached or live) references the expression — no use-after-free
  * window.
  */
final class BcRef[T] private (
    private val payload: Either[Broadcast[T], T]) extends Serializable {
  def value: T = payload.fold(_.value, identity)
}

object BcRef {
  def apply[T](value: T)(implicit ct: scala.reflect.ClassTag[T]): BcRef[T] = {
    val sc = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext).filterNot(_.isStopped)
    new BcRef(sc.flatMap { c =>
      // a context racing shutdown can refuse the broadcast — fall
      // back to the inline payload rather than failing the build
      scala.util.Try(c.broadcast(value)).toOption
    } match {
      case Some(b) => Left(b)
      case None => Right(value)
    })
  }
}
