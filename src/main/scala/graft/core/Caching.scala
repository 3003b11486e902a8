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
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
