package graft.graph

/**
 * Registry of long-lived checkpointed RDDs (the engine's warm adjacency
 * caches) that a benchmark's between-query persistent-RDD sweep must NOT
 * unpersist: a locally-checkpointed RDD has truncated lineage, so freeing
 * its blocks while a live graph handle still references it turns the next
 * traversal into a missing-block error, not a recompute.
 *
 * Entries hold the owning graph snapshot WEAKLY: once a snapshot is
 * garbage-collected (e.g. an intermediate write-pipeline snapshot), its
 * topology blocks lose protection and the next sweep reclaims them — so
 * protection never leaks memory across a long benchmark JVM.
 */
object RddGuard {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.ref.WeakReference[AnyRef]]

  def protect(rddId: Int, owner: AnyRef): Unit =
    entries.put(rddId, new java.lang.ref.WeakReference[AnyRef](owner))

  /** RDD ids whose owner is still live; stale entries are pruned. */
  def liveIds(): Set[Int] = {
    val it = entries.entrySet().iterator()
    val b = Set.newBuilder[Int]
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.get == null) it.remove() else b += e.getKey
    }
    b.result()
  }
}
