package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S2/S3/S5 — OTLP-shaped nesting and the flatten back to one row per
  * datapoint (reference: internal/receiver/otlp.go:91-124 three-level
  * resource→scope→metric→datapoint flatten; :126-285 per-type conversion;
  * :332-344 attribute merge).
  *
  * The gRPC transport itself is out of scope (SURVEY §2.1 S1) — the engine's
  * ingest surface is "a DataFrame shaped like an OTLP export": one row per
  * resource, with `resource` attrs and an array of datapoint structs. At
  * 100 TB this arrives as a parquet/stream source already sharded by resource;
  * the flatten below is generator (explode) work — narrow, no shuffle,
  * whole-stage codegen.
  */
object OtlpFlatten {

  /** Nest a flat datapoint DataFrame into OTLP export shape: one row per
    * (resource = service+workspace), datapoints collected. Used by tests and
    * the round-trip oracle query to prove flatten ∘ nest = identity. */
  def nest(flat: DataFrame, resourceCols: Seq[Column], dpStruct: Column): DataFrame =
    flat.groupBy(resourceCols: _*)
      .agg(collect_list(dpStruct).as("datapoints"))

  /** S2 — explode an OTLP-shaped frame back to one row per datapoint.
    * `service.name` extraction from resource attrs (otlp.go:99-102) is the
    * caller's `element_at(resource_attrs, "service.name")`. */
  def flatten(nested: DataFrame): DataFrame =
    nested.withColumn("dp", explode(col("datapoints"))).drop("datapoints")

  /** S3 — +Inf bucket-bound synthesis: OTLP carries N bounds and N+1 counts;
    * the last bucket's bound is +Inf (otlp.go:216-221). `bounds` has N doubles,
    * `counts` N+1 longs → array<struct<le,count>> of N+1 entries. */
  def withInfBucket(bounds: Column, counts: Column): Column =
    zip_with(
      concat(bounds, array(lit(Double.PositiveInfinity))),
      counts,
      (le, c) => struct(le.as("le"), c.as("count")))

  /** S5 — attribute merge, datapoint wins on key collision (otlp.go:332-344).
    * `map_concat` in Spark fails on duplicate keys under ANSI; emulate
    * last-wins by concatenating entry arrays datapoint-last and rebuilding via
    * map_from_entries? map_from_entries errors on dups too — so: drop resource
    * entries whose key the datapoint also has, then concat. */
  def mergeAttributes(resourceAttrs: Column, dpAttrs: Column): Column = {
    val keep = filter(
      map_entries(resourceAttrs),
      e => !map_contains_key(dpAttrs, e.getField("key")))
    map_from_entries(concat(keep, map_entries(dpAttrs)))
  }

  /** F10/F11 — OTLP values may be int or double; widen to double
    * (otlp.go:148-155). */
  def widen(value: Column): Column = value.cast("double")
}
