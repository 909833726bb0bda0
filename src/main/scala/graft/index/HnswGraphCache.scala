package graft.index

/** Executor-local LRU of rebuilt HNSW subgraphs, keyed by (index identity,
  * partition id). Serving workloads search the same stored index with batch
  * after batch of queries; without this every batch re-decodes the adjacency
  * rows and re-allocates the graph. One entry per subgraph per executor JVM;
  * the caller's key must change whenever the underlying index changes (the
  * catalog keys on table version + row count, so any add/delete rotates the
  * key and stale graphs age out of the LRU).
  *
  * Same-key same-pid entries are deterministic (the sidecar is immutable for
  * a given key), so a racing duplicate build is wasted work, not a
  * correctness issue — builds run outside the lock.
  */
object HnswGraphCache {

  /** Cached unit: the rebuilt graph plus the local→global id mapping. */
  final case class Entry(graph: HnswGraph, ids: Array[Long])

  private val MaxEntries = 64

  private val cache =
    new java.util.LinkedHashMap[(String, Int), Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Entry]): Boolean =
        size() > MaxEntries
    }

  def get(key: String, pid: Int)(build: => Entry): Entry = {
    val k = (key, pid)
    val hit = cache.synchronized(Option(cache.get(k)))
    hit.getOrElse {
      val e = build
      cache.synchronized(cache.put(k, e))
      e
    }
  }

  /** Group variant for the pinned (beyond-broadcast) serving path: one
    * entry per SPARK partition of the pinned index dataset, holding every
    * (subgraph id, rebuilt graph) that partition carries. Keyed by Spark
    * partition id — stable across jobs over the same persisted RDD — so a
    * repeat batch can skip reading the partition's rows entirely (the
    * `build` thunk, which consumes them, is only forced on a miss). The
    * subgraph id rides along so routed searches (IVF+HNSW: pid = cluster)
    * can skip graphs the query does not probe. */
  private val groupCache =
    new java.util.LinkedHashMap[(String, Int), Array[(Int, Entry)]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Array[(Int, Entry)]]): Boolean =
        size() > MaxEntries
    }

  def getGroup(key: String, spid: Int)(build: => Array[(Int, Entry)]): Array[(Int, Entry)] = {
    val k = (key, spid)
    val hit = groupCache.synchronized(Option(groupCache.get(k)))
    hit.getOrElse {
      val e = build
      groupCache.synchronized(groupCache.put(k, e))
      e
    }
  }

  /** Drop every entry whose key starts with `prefix` — called when a table
    * or sidecar is deleted so rebuilt multi-GB graphs don't outlive their
    * data. Effective for this JVM (driver == executor in local mode);
    * remote executors rely on LRU aging + content-versioned key rotation. */
  def invalidate(prefix: String): Unit = {
    cache.synchronized(cache.keySet().removeIf(k => k._1.startsWith(prefix)))
    groupCache.synchronized(groupCache.keySet().removeIf(k => k._1.startsWith(prefix)))
  }
}
