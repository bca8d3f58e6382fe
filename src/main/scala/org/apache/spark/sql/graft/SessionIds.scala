package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Accessor for the session's stable UUID, which is `private[sql]` on the
  * classic implementation class (hence this bridge lives in an
  * `org.apache.spark.sql` subpackage, like the expression kernels).
  * `graft.Readers` keys its schema/artifact memos by it — unique for the
  * session's lifetime and never reused, where an identity hash can recur
  * after a stopped session is GC'd (or collide between live sessions) and
  * serve another session's memoized state.
  */
object SessionIds {
  def uuid(spark: SparkSession): Option[String] = spark match {
    case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }
}
