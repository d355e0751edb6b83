package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Session-keyed persisted-frame cache for reusable index artifacts
  * (minhash signatures, simhash sketches, LSH-bucketed embeddings,
  * rotated frames).
  *
  * Why this exists: a per-call `df.persist()` inside an operator pins a
  * NEW MEMORY_AND_DISK frame in the cache manager for the life of the
  * session on every invocation — across a 100+ query run those leaks
  * accumulate into storage-eviction thrash (VERDICT r3 measured d11 at
  * 17.4s in-run vs 3.5s isolated from exactly this). Routing every such
  * persist through one session-keyed cache bounds the pinned set to one
  * frame per distinct (session, artifact) and drops entries when their
  * session stops.
  *
  * Concurrency discipline: `build` (cluster jobs — fits, signature
  * passes) never runs under the cache monitor; a racing duplicate build
  * is deterministic and idempotent, and the loser unpersists its copy.
  */
object FrameCache {

  private final case class Entry(plan: Option[LogicalPlan], df: DataFrame,
                                 persisted: Boolean)

  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), Entry]

  private def prune(): Unit =
    cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }

  /** Get-or-build a frame keyed by (session, key). With `persist = true`
    * (default) the built frame is pinned MEMORY_AND_DISK; callers whose
    * artifact is a kilobyte local relation (driver-side fit output) pass
    * `persist = false`.
    *
    * `inputPlan`, when given, is verified on every hit with
    * `sameResult` — a stale entry built from a different input under the
    * same key (hash collision, regenerated data) is unpersisted and
    * rebuilt instead of silently served.
    */
  def cached(s: SparkSession, key: String, persist: Boolean = true,
             inputPlan: Option[LogicalPlan] = None)
            (build: => DataFrame): DataFrame = {
    val hit = cache.synchronized {
      prune()
      cache.get((s, key)) match {
        case Some(e) =>
          val fresh = (e.plan, inputPlan) match {
            case (Some(p), Some(q)) => p.sameResult(q)
            case _ => true
          }
          if (fresh) Some(e.df)
          else {
            if (e.persisted) e.df.unpersist(blocking = false)
            cache.remove((s, key))
            None
          }
        case None => None
      }
    }
    hit match {
      case Some(df) => df
      case None =>
        val built =
          if (persist) build.persist(StorageLevel.MEMORY_AND_DISK)
          else build
        cache.synchronized {
          cache.get((s, key)) match {
            case Some(winner) =>
              if (persist) built.unpersist(blocking = false)
              winner.df
            case None =>
              cache.update((s, key), Entry(inputPlan, built, persist))
              built
          }
        }
    }
  }

  /** Operator-facing variant: key derived from the input frame's
    * analyzed-plan semantic hash (collisions caught by the `sameResult`
    * check above), so two calls over the same logical input share one
    * pinned artifact and calls over different inputs don't collide.
    */
  def forInput(input: DataFrame, tag: String)
              (build: => DataFrame): DataFrame = {
    val plan = input.queryExecution.analyzed
    cached(input.sparkSession, s"$tag:${plan.semanticHash()}",
      persist = true, inputPlan = Some(plan))(build)
  }
}
