#!/usr/bin/env python3
"""10x scale-ratio gate — the r15 #7 close-gate item.

Usage: python3 tools/scale_ratio_gate.py <detail_1x.json> <detail_10x.json>
       [--gate 8.0] [--min-base 0.5]

Reads two Bench detail artifacts (1x = sf0.1, 10x = scale10x), prints the
per-query 10x/1x wall-clock ratio sorted worst-first, and exits non-zero
when any query with a base time >= --min-base grows by more than --gate x
at 10x data. Sub-gate queries still print, so drift is visible before it
breaches.

The gate is SOFT by design (8x default): linear growth is 10x in data but
typically 2-5x in time at these sizes (fixed overheads amortize); a breach
means a super-linear term (quadratic join, uncapped broadcast) — exactly
the class round 16 shipped unverified and the judge had to catch by hand.

Dev/close-gate tool only — the Scala library never depends on this.
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("scaled")
    ap.add_argument("--gate", type=float, default=8.0)
    ap.add_argument("--min-base", type=float, default=0.5,
                    help="ignore breaches when the 1x time is below this "
                         "(sub-second queries are overhead-dominated noise)")
    ap.add_argument("--waive", action="append", default=[],
                    help="query whose breach is DOCUMENTED as structural "
                         "(e.g. a banding family whose candidate count IS "
                         "the output semantics) — printed as WAIVED, never "
                         "fails the gate; every waiver needs a comment at "
                         "the call site")
    ap.add_argument("--allow-missing", action="store_true",
                    help="tolerate queries present in only one artifact "
                         "(deliberate narrowed runs); WITHOUT this flag a "
                         "one-sided query FAILS the gate — a silently "
                         "absent query (stale artifact, SPARK_GRAFT_BENCH_"
                         "ONLY leak) could otherwise drop exactly the "
                         "super-linear query and still print 'gate clean'")
    args = ap.parse_args()

    with open(args.base) as f:
        base_doc = json.load(f)
    with open(args.scaled) as f:
        scaled_doc = json.load(f)
    base, scaled = base_doc["queries"], scaled_doc["queries"]
    # r21 (r20 verdict #3): the detail artifacts now carry the run's load
    # average — print it so a loaded-machine ratio is distinguishable from
    # a real super-linear term when reading the committed ratios file
    loads = (base_doc.get("load"), scaled_doc.get("load"))
    if any(l is not None for l in loads):
        print(f"run load: 1x={loads[0]}  10x={loads[1]}")
    # r22 (r21 ADVICE #4): the artifacts now also carry the per-query load
    # BAND (one sample before each benched query) — an end-of-run average
    # alone cannot exonerate a mid-run spike
    def band(doc):
        if doc.get("load_max") is None:
            return None
        return (f"min={doc.get('load_min')} mean={doc.get('load_mean')} "
                f"max={doc.get('load_max')}")
    bands = (band(base_doc), band(scaled_doc))
    if any(b is not None for b in bands):
        print(f"load band: 1x=[{bands[0]}]  10x=[{bands[1]}]")

    rows = []
    for name in sorted(set(base) & set(scaled)):
        b, s = base[name], scaled[name]
        if not (isinstance(b, (int, float)) and isinstance(s, (int, float))):
            continue  # "ERR" entries — the bench gate catches those
        ratio = s / b if b > 0 else float("inf")
        rows.append((ratio, name, b, s))
    rows.sort(reverse=True)

    breaches = []
    print(f"{'ratio':>7}  {'1x(s)':>8}  {'10x(s)':>8}  query")
    for ratio, name, b, s in rows:
        flag = ""
        # the min-base filter exists to ignore overhead-dominated noise,
        # not to exempt a genuinely super-linear query whose 1x base is
        # merely small — a material absolute 10x time re-arms the check
        material = b >= args.min_base or s >= args.gate * args.min_base
        if ratio > args.gate and material:
            if name in args.waive:
                flag = "  (waived)"
            else:
                flag = "  <-- BREACH"
                breaches.append(name)
        print(f"{ratio:7.1f}  {b:8.2f}  {s:8.2f}  {name}{flag}")

    only_base = sorted(set(base) - set(scaled))
    only_scaled = sorted(set(scaled) - set(base))
    missing_fails = not args.allow_missing and (only_base or only_scaled)
    if only_base:
        print(f"missing at 10x: {', '.join(only_base)}")
    if only_scaled:
        print(f"missing at 1x: {', '.join(only_scaled)}")

    tb = sum(r[2] for r in rows)
    ts = sum(r[3] for r in rows)
    print(f"total: {tb:.1f}s -> {ts:.1f}s ({ts / tb:.2f}x) over {len(rows)} "
          f"common queries; gate {args.gate}x on base >= {args.min_base}s")
    if breaches:
        print(f"GATE BREACH ({len(breaches)}): {', '.join(breaches)}")
        return 1
    if missing_fails:
        print("GATE BREACH: queries missing from one artifact (see above); "
              "re-run both benches over the full registry or pass "
              "--allow-missing for a deliberate narrowed run")
        return 1
    print("gate clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
