"""Arrow-layer parity check: the driver's CORRECTNESS hash is computed
over Arrow-typed values, so two result sets can be value-equal under
Python comparison yet hash-differently when their Arrow types diverge
(DuckDB HUGEINT -> decimal128(38,0) vs Spark bigint; tz-adjusted vs
naive timestamps; decimal(22,2) vs decimal(38,2)) — exactly what sank
docs_pack_sequences and events_windowed_counts in round 4.

This tool runs a query's Spark side and its DuckDB oracle and compares
the ARROW schemas (column-name-sorted, like the driver) plus a
canonical value digest, so type skew is caught before the driver sees
it.

Usage: python tools/arrow_parity.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _sorted_table(tbl: pa.Table) -> pa.Table:
    names = sorted(tbl.column_names)
    return tbl.select(names)


def _digest(tbl: pa.Table) -> str:
    """Order-insensitive value digest over the Arrow representation:
    one line per row of repr'd values (Arrow repr carries the type's
    precision), sorted, then sha1."""
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = sorted(repr(tuple(c[i] for c in cols)) for i in range(tbl.num_rows))
    return hashlib.sha1("\n".join(rows).encode()).hexdigest()[:16]


def main(only: list[str]) -> int:
    from marc2rdf_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.ansi.enabled", "true")
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
        if name not in oracles:
            print(f"{name}: (no oracle — rows-only query, skipped)")
            continue
        t0 = time.time()
        try:
            s_tbl = _sorted_table(fn(spark, SF_DIR).toArrow())
            o_tbl = _sorted_table(con.execute(oracles[name]).fetch_arrow_table())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        schema_ok = s_tbl.schema.types == o_tbl.schema.types and (
            s_tbl.column_names == o_tbl.column_names
        )
        hash_ok = schema_ok and _digest(s_tbl) == _digest(o_tbl)
        status = "OK" if (schema_ok and hash_ok) else "FAIL"
        print(
            f"{name}: {status} rows={s_tbl.num_rows}/{o_tbl.num_rows} "
            f"({dt:.1f}s)"
        )
        if not schema_ok:
            failures += 1
            for n_, st, ot in zip(
                s_tbl.column_names, s_tbl.schema.types, o_tbl.schema.types
            ):
                if st != ot:
                    print(f"  type skew {n_}: spark={st} oracle={ot}")
            if s_tbl.column_names != o_tbl.column_names:
                print(
                    f"  cols: spark={s_tbl.column_names} "
                    f"oracle={o_tbl.column_names}"
                )
        elif not hash_ok:
            failures += 1
            print("  value digest mismatch (types match)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
