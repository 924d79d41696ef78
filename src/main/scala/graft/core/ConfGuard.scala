package graft.core

import org.apache.spark.sql.SparkSession

/** Ref-counted session-conf override.
  *
  * A library operator that flips a session flag around its build (extend's
  * constraint-propagation disable, GraphSearch's AQE suspension) must not
  * use a plain save/restore: two concurrent operators on one session can
  * interleave — A saves "true", sets off; B saves "off", sets off; A
  * restores "true"; B restores "off" — stranding the user's flag for the
  * rest of the session. Here the FIRST acquire of a (session, key) saves
  * the user's value and applies the override; only the LAST release
  * restores it. Concurrent acquires of the same key must want the same
  * override value (all current uses set "false").
  */
object ConfGuard {
  /** (session, key) -> (override depth, user's saved value at first acquire). */
  private val state =
    new java.util.HashMap[(SparkSession, String), (Int, Option[String])]()

  def acquire(spark: SparkSession, key: String, value: String): Unit =
    state.synchronized {
      state.get((spark, key)) match {
        case null =>
          val saved = spark.conf.getOption(key)
          spark.conf.set(key, value)
          state.put((spark, key), (1, saved))
        case (depth, saved) => state.put((spark, key), (depth + 1, saved))
      }
    }

  def release(spark: SparkSession, key: String): Unit =
    state.synchronized {
      state.get((spark, key)) match {
        case null => ()
        case (depth, saved) if depth <= 1 =>
          state.remove((spark, key))
          saved match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        case (depth, saved) => state.put((spark, key), (depth - 1, saved))
      }
    }

  /** Run `f` with `key` overridden to `value`, ref-counted per session. */
  def withOverride[T](spark: SparkSession, key: String, value: String)(f: => T): T = {
    acquire(spark, key, value)
    try f finally release(spark, key)
  }
}
