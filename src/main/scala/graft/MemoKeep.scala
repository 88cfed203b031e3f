package graft

/** Registry of persistent-RDD ids owned by cross-query memos (shingle
  * store, and any future "build once, consume many" intermediate).
  *
  * Bench releases every persistent RDD a query leaves behind (storage
  * hygiene across a 500-query single-JVM run) — but a memoized
  * localCheckpoint's lineage is TRUNCATED, so releasing its blocks while
  * the memo object is still handed out would make every later consumer
  * fail, not recompute. Memos register their block ids here and the
  * bench's release pass skips them. */
object MemoKeep {
  private val ids = scala.collection.mutable.Set.empty[Int]

  def protect(rddIds: Set[Int]): Unit = synchronized { ids ++= rddIds }

  /** Release protection for a memo's blocks when the memo itself is
    * evicted — the owner must also unpersist the blocks, or they stay
    * resident (merely unprotected) until the context dies. */
  def unprotect(rddIds: Set[Int]): Unit = synchronized { ids --= rddIds }

  def isProtected(rddId: Int): Boolean = synchronized { ids.contains(rddId) }

  def clear(): Unit = synchronized { ids.clear() }
}
