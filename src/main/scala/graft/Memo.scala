package graft

import java.util.concurrent.ConcurrentHashMap

/** get → load → putIfAbsent memoization for loaders that RUN SPARK JOBS
  * (model fits, driver collects, count jobs). `computeIfAbsent` would hold
  * the map's bin lock across the job: a loader that transitively loads
  * through the same map would throw IllegalStateException("Recursive
  * update") or deadlock, and concurrent sessions' unrelated loads hashing
  * to one bin would serialize behind each other's driver jobs — the
  * [[Readers.artifact]] lock discipline, shared so every model/artifact
  * cache in the engine gets it by construction. The cost is a benign
  * double load under a miss race (loaders are deterministic functions of
  * their key; `putIfAbsent` keeps whichever landed first).
  */
object Memo {
  def once[V <: AnyRef](map: ConcurrentHashMap[String, V], key: String)(load: => V): V = {
    val cached = map.get(key)
    if (cached != null) cached
    else {
      val loaded = load
      val prev = map.putIfAbsent(key, loaded)
      if (prev != null) prev else loaded
    }
  }

  private val keyLocks = new ConcurrentHashMap[String, Object]()

  /** [[once]] for SIDE-EFFECTING loaders (an artifact write, a directory
    * build) where a miss-race double load is NOT benign: two threads
    * running the loader concurrently would race two Overwrite jobs on one
    * artifact path. Same-KEY loads serialize on a dedicated per-key lock —
    * never the map's bin lock, so unrelated keys stay fully concurrent and
    * a loader may still load OTHER keys through the same map. (A loader
    * recursing through its OWN key would self-deadlock, exactly as it
    * would have under `computeIfAbsent` — side-effecting loaders are
    * leaves by contract.)
    */
  def onceExclusive[V <: AnyRef](map: ConcurrentHashMap[String, V], key: String)(load: => V): V = {
    val cached = map.get(key)
    if (cached != null) cached
    else keyLocks.computeIfAbsent(key, _ => new Object).synchronized {
      val again = map.get(key)
      if (again != null) again
      else {
        val loaded = load
        map.put(key, loaded)
        loaded
      }
    }
  }
}
