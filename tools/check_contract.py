"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 side-by-side with its DuckDB oracle and
compare row count, schema width, and order-insensitive values.

Usage: python tools/check_contract.py [--ansi] [query ...]

``--ansi`` replicates the driver harness's session semantics (vanilla
Spark 4.x defaults: ANSI on, mapKeyDedupPolicy EXCEPTION) instead of
the repo's get_spark tuning — run it before shipping, since the driver
does not apply session.py's confs.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(norm(r[i]) for i in order) for r in rows
    )


def main(only: list[str], ansi: bool = False) -> int:
    from marc2rdf_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    if ansi:
        # Driver-default SQL semantics (both confs are runtime-settable)
        spark.conf.set("spark.sql.ansi.enabled", "true")
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        print("== driver-default session semantics (ANSI on) ==")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [rows-only]")
            if not cols:
                failures += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {e}")
            failures += 1
            continue
        ok_schema = sorted(c.lower() for c in cols) == sorted(
            c.lower() for c in ocols
        )
        a, b = rowset(rows, cols), rowset(orows, ocols)
        ok = ok_schema and a == b
        status = "ok   " if ok else "FAIL "
        print(
            f"{status} {name}: spark={len(rows)} oracle={len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(cols)} vs {sorted(ocols)}'} "
            f"({dt:.1f}s)"
        )
        if not ok:
            failures += 1
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print("   spark-only:", r)
            for r in list(sb - sa)[:3]:
                print("   oracle-only:", r)
    spark.stop()
    return failures


if __name__ == "__main__":
    argv = sys.argv[1:]
    ansi = "--ansi" in argv
    argv = [a for a in argv if a != "--ansi"]
    sys.exit(1 if main(argv, ansi=ansi) else 0)
