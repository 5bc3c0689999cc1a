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


def write_sameas_edges() -> int:
    """Deterministic sameAs fixture (FIXTURES.md §5): chains, stars, and
    one large hub component."""
    edges: list[tuple[str, str]] = []

    def uri(n: int) -> str:
        return f"http://example.com/id_{7000000 + n}"

    # chains of length 4: (0-1-2-3), (10-11-12-13), ...
    for base in range(0, 50, 10):
        for j in range(3):
            edges.append((uri(base + j), uri(base + j + 1)))
    # stars: hub 100 + leaves 101..108
    for leaf in range(101, 109):
        edges.append((uri(100), uri(leaf)))
    # one large hub component: 200 connected to 201..240
    for leaf in range(201, 241):
        edges.append((uri(200), uri(leaf)))
    # cross-link chain into star (single component check)
    edges.append((uri(3), uri(100)))

    table = pa.Table.from_arrays(
        [
            pa.array([e[0] for e in edges]),
            pa.array([e[1] for e in edges]),
        ],
        names=["left_uri", "right_uri"],
    )
    pq.write_table(table, os.path.join(GOLDEN_DIR, "sameas_edges.parquet"))
    return len(edges)


def write_authorities() -> int:
    """Authority table (FIXTURES.md §4): canonical labels from the golden
    records' relation nodes plus seeded noise variants."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT subj, obj FROM read_parquet(?) "
        "WHERE pred = 'http://def.bibsys.no/xmlns/radatana/1.0#catalogueName'",
        [os.path.join(GOLDEN_DIR, "triples_skeleton.parquet")],
    ).fetchall()
    auth_rows = []
    for i, (subj, label) in enumerate(sorted(set(rows))):
        auth_rows.append(
            (f"http://authority.example.org/person/{i}", "person", label, subj)
        )
    table = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in auth_rows]),
            pa.array([r[1] for r in auth_rows]),
            pa.array([r[2] for r in auth_rows]),
            pa.array([r[3] for r in auth_rows]),
        ],
        names=["auth_id", "kind", "label", "true_mention"],
    )
    pq.write_table(table, os.path.join(GOLDEN_DIR, "authorities.parquet"))
    return len(auth_rows)


def write_binary_corpus(shards: int = 8) -> int:
    """Deterministic ISO 2709 corpus (fixtures/golden/binary_mrc/): the
    SAME records the golden triples were generated from, serialized to
    binary MARC and sharded into several .mrc files (the reference's
    MARC::ForgivingReader CLI input shape, marc2rdf.rb:50).  Because the
    record set is identical, converting this corpus with the skeleton
    mapping must reproduce triples_skeleton.parquet exactly — which is
    what gives the binary reader (S1) a value-level contract oracle."""
    from marc2rdf_spark.marc import record_to_iso2709

    records = expected_records(N_GOLDEN_PAGES)
    out_dir = os.path.join(GOLDEN_DIR, "binary_mrc")
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        os.unlink(os.path.join(out_dir, f))
    for s in range(shards):
        blob = b"".join(
            record_to_iso2709(rec) for rec in records[s::shards]
        )
        with open(os.path.join(out_dir, f"shard-{s:02d}.mrc"), "wb") as fh:
            fh.write(blob)
    return len(records)


if __name__ == "__main__":
    n1 = write_golden("triples_dummy", load_dummy_mapping())
    print(f"triples_dummy.parquet: {n1} triples from {N_GOLDEN_PAGES} pages")
    n2 = write_golden("triples_skeleton", load_skeleton_mapping())
    print(f"triples_skeleton.parquet: {n2} triples from {N_GOLDEN_PAGES} pages")
    n3 = write_sameas_edges()
    print(f"sameas_edges.parquet: {n3} edges")
    n4 = write_authorities()
    print(f"authorities.parquet: {n4} authorities")
    n5 = write_binary_corpus()
    print(f"binary_mrc/: {n5} ISO 2709 records")
