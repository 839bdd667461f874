package graft.query

import org.apache.spark.sql.{Column, DataFrame}

/** Globally-ordered output without double-executing an expensive projection.
  *
  * `df.orderBy(k)` plans a range-shuffle whose boundary sampling pass executes
  * the ENTIRE child plan once before the real pass runs it again — so a query
  * shaped `scan → heavy per-row projection → orderBy` pays the projection
  * twice. At 100 TB that is the whole CPU bill doubled for a deterministic
  * output order.
  *
  * [[projectSorted]] restates the same query as
  * `scan → repartitionByRange(keys) → heavy projection → sortWithinPartitions`:
  * the range shuffle (and its sampling pass) sees only the narrow scan, the
  * heavy projection runs exactly once post-shuffle, and the within-partition
  * sort plus the range partitioning yields the same total order — partition i
  * holds a key range strictly below partition i+1, rows sorted inside each.
  * Consumers that concatenate partitions in index order (parquet part files,
  * `coalesce(1)`, `toLocalIterator`) observe the identical global order an
  * `orderBy` would produce.
  *
  * Requirements: `keys` must exist on `base`, survive `heavy` un-renamed, and
  * (for a deterministic total order) be a full tiebreak. `heavy` may filter —
  * dropping rows keeps both the range property and the per-partition order.
  */
object RangeSort {

  def projectSorted(base: DataFrame, keys: Seq[Column])
      (heavy: DataFrame => DataFrame): DataFrame =
    projectSorted(base, keys, keys)(heavy)

  /** Variant with `partKeys` a strict PREFIX of `sortKeys` — the shape for
    * window/aggregate pipelines: range-partition by the series/group keys
    * only (the clustering the window or aggregation needs, so EnsureRequirements
    * inserts no further exchange), compute, then sort within partitions by the
    * full output order. Range partition on the prefix + within-partition sort
    * on the whole key list is still a total order. When `heavy` ends in a
    * window sorted on exactly `sortKeys`, the final sort is elided outright —
    * the plan has ONE exchange and zero redundant passes. */
  def projectSorted(base: DataFrame, partKeys: Seq[Column], sortKeys: Seq[Column])
      (heavy: DataFrame => DataFrame): DataFrame =
    heavy(base.repartitionByRange(partKeys: _*)).sortWithinPartitions(sortKeys: _*)
}
