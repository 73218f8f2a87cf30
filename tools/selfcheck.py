"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given sf dir, compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = f"{v:.6f}"
                if v == "-0.000000":
                    v = "0.000000"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the literal-VALUES oracles (linkgraph/oracle/literal.py) are
    # generated for a specific dataset — point them at the one under
    # test (must happen before oracle_sql() imports the module)
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as se
    from linkgraph.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [r.asDict() for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(srows)} rows, {t_spark:.1f}s")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = [dict(zip(ocols, r)) for r in cur.fetchall()]
        t_duck = time.time() - t0

        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: schema spark={scols} duck={ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            cols = sorted(scols)
            a, b = canon(srows, cols), canon(orows, cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                print(f"FAIL {name}: values differ, first diffs {diffs}")
                ok = False
        if ok:
            print(
                f"  OK {name}: {len(srows)} rows  spark={t_spark:.1f}s duck={t_duck:.1f}s"
            )
        else:
            failures += 1
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
