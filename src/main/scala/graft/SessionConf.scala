package graft

import org.apache.spark.sql.SparkSession

/** Scoped set/restore of a session conf key, serialized PER SESSION — the
  * one correct shape for temporarily bending shared mutable conf:
  *  - per-session monitor, so two scopes on ONE session can never interleave
  *    their set/restore (thread B would otherwise capture thread A's
  *    temporary value as "previous" and restore it permanently);
  *  - sessions are independent — scopes on different `newSession()` clones
  *    (separate conf, shared cache) run concurrently, which is exactly the
  *    isolation route the graph scaladocs point mixed workloads at.
  * A concurrent query on the SAME session still observes the scoped value
  * for the scope's duration — that is inherent to shared conf and stays a
  * documented caveat, not something a lock can fix. Note also that the
  * monitor is held for the WHOLE body: a scope wrapping a long iterative
  * loop (the keyed-graph queries hold it for the full fixpoint) serializes
  * every other `withValue` scope on that session for that long — callers
  * wanting conf-scope concurrency should take the `newSession()` route,
  * not share one session.
  *
  * The registry keys sessions WEAKLY (all lookups synchronize on the map
  * itself — `computeIfAbsent` through a synchronized wrapper would not be
  * atomic): a long-lived process that churns `newSession()` clones (the
  * very pattern recommended above) must not pin each discarded clone's
  * full session state forever via a strong registry key. The monitor
  * Object holds no reference back to the session, so an unreferenced
  * clone — necessarily one with no live scope, since an active scope's
  * stack frame keeps the session strongly reachable — collects normally
  * and its entry vanishes with it. */
private[graft] object SessionConf {
  private val locks = new java.util.WeakHashMap[SparkSession, Object]()

  private def lockFor(s: SparkSession): Object = locks.synchronized {
    val existing = locks.get(s)
    if (existing != null) existing
    else { val o = new Object; locks.put(s, o); o }
  }

  def withValue[T](s: SparkSession, key: String, value: String)(body: => T): T =
    lockFor(s).synchronized {
      val prev = s.conf.getOption(key)
      s.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
}
