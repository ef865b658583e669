package graft

import java.util.concurrent.ConcurrentHashMap

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
  * documented caveat, not something a lock can fix.
  *
  * The lock registry holds a strong ref per session; engine processes use
  * one (or a handful of) sessions for their lifetime, so the registry is
  * bounded by design. */
private[graft] object SessionConf {
  private val locks = new ConcurrentHashMap[SparkSession, Object]()

  def withValue[T](s: SparkSession, key: String, value: String)(body: => T): T =
    locks.computeIfAbsent(s, _ => new Object).synchronized {
      val prev = s.conf.getOption(key)
      s.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
}
