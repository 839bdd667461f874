#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the sf
parquet tables registered as views, and compares against the Spark parquet
dump in <verifyOutDir>/<name>/. Compare mirrors the driver: sort columns by
name, sort rows, round doubles, hash values.

Dev tool only — the Scala library never depends on this.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class NonAtomicColumn(Exception):
    pass


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6g}"
            elif isinstance(v, (list, tuple, dict, set)):
                # The driver's pandas canonicalizer crashes on array cells
                # (sort_values: unhashable ndarray) — the local stand-in
                # must be at least as strict, not silently more lenient
                # (round 17: q_embed_hashed/q_tokenize_ids passed here and
                # hard-errored in CORRECTNESS_r17).
                raise NonAtomicColumn(
                    f"non-atomic value in column '{cols[i]}' "
                    f"({type(v).__name__}) — the driver cannot hash this; "
                    "explode to rows or serialize to a string")
            else:
                v = str(v)
            vals.append(v)
        out.append("\x1f".join(vals))
    return sorted(out), [cols[i] for i in order]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table: a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            o = con.execute(oracle[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            s = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            oc, ocols = canon(o_rows, o_cols)
            sc, scols = canon(s_rows, s_cols)
        except NonAtomicColumn as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: schema {scols} vs oracle {ocols}")
            n_fail += 1
        elif len(oc) != len(sc):
            print(f"FAIL {name}: rows {len(sc)} vs oracle {len(oc)}")
            n_fail += 1
        elif oc != sc:
            diff = next(i for i in range(len(oc)) if oc[i] != sc[i])
            print(f"FAIL {name}: value mismatch at sorted row {diff}:")
            print(f"  spark : {sc[diff][:300]}")
            print(f"  oracle: {oc[diff][:300]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sc)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
