"""Generate golden triple fixtures (fixtures/golden/*.parquet) by running
the pure-Python oracle converter over the deterministic synthetic corpus.

These fixtures are the DuckDB side of the driver's correctness gate: the
Spark pipeline (synthesis -> extract -> compiled mapping -> dedup) must
reproduce them exactly.  Regenerate with:  python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from marc2rdf_spark.config import Library, load_dummy_mapping, load_skeleton_mapping  # noqa: E402
from marc2rdf_spark.oracle.converter import convert_records  # noqa: E402
from marc2rdf_spark.sources.synth import expected_records  # noqa: E402

N_GOLDEN_PAGES = 120

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "golden",
)

SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_uri", pa.bool_()),
        ("lang", pa.string()),
        ("dtype", pa.string()),
    ]
)


def write_golden(name: str, mapping) -> int:
    records = expected_records(N_GOLDEN_PAGES)
    triples = convert_records(records, mapping, Library(), dedup=True)
    cols = list(zip(*triples))
    table = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, SCHEMA)], schema=SCHEMA
    )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pq.write_table(table, os.path.join(GOLDEN_DIR, f"{name}.parquet"))
    return len(triples)


if __name__ == "__main__":
    n1 = write_golden("triples_dummy", load_dummy_mapping())
    print(f"triples_dummy.parquet: {n1} triples from {N_GOLDEN_PAGES} pages")
    n2 = write_golden("triples_skeleton", load_skeleton_mapping())
    print(f"triples_skeleton.parquet: {n2} triples from {N_GOLDEN_PAGES} pages")
