"""Value-level oracle parity for the round-5 curation operators that
live OUTSIDE the 50-row driver contract (the driver's correctness
sweep truncates at 50 rows, so these three are pinned here instead —
same rigor, different harness):

- ``line_dedup``       vs a full DuckDB SQL oracle (independent engine)
- ``canonical_url``    vs a urllib-based pure-Python oracle
                       (independent implementation, not a regex twin)
- ``seeded_shard``     vs a pure-Python xxhash64 reimplementation of
                       Spark's pinned XXH64(seed)-over-long algorithm,
                       making shard/ord_key value-verified, not just
                       property-checked

Inputs derive from the driver-generated sf0.001 ``documents`` table;
multi-line text and URLs are synthesized deterministically from
doc_id/source because the generated corpus has neither newlines nor
URLs (same pattern as the docs_pii_scrub contract row, which injects
deterministic PII).
"""

from __future__ import annotations

import math
import re
import struct
from urllib.parse import urlsplit, urlunsplit

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
NL = "\n"


def _docs_multiline(spark):
    """documents with deterministic multi-line text: a corpus-wide
    header (always boilerplate), the original text, a footer shared by
    doc_id % 3 (boilerplate at frac thresholds <= 1/3), a blank line,
    and a per-doc unique line."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "doc_id",
        F.concat_ws(
            NL,
            F.lit("  Accept all cookies  "),
            F.col("text"),
            F.concat(F.lit("nav chrome "), F.col("doc_id") % 3),
            F.lit(""),
            F.concat(F.lit("unique tail "), F.col("doc_id")),
        ).alias("text"),
    )


def test_line_dedup_duckdb_parity(spark):
    from marc2rdf_spark.operators.curation import line_dedup

    out = {
        r.doc_id: (r.text_clean, r.n_lines, r.n_removed)
        for r in line_dedup(
            _docs_multiline(spark), min_doc_frac=0.01, min_docs=2
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(
        "WITH a AS (SELECT doc_id, '  Accept all cookies  ' || chr(10) || "
        "text || chr(10) || 'nav chrome ' || CAST(doc_id % 3 AS VARCHAR) "
        "|| chr(10) || '' || chr(10) || 'unique tail ' || "
        "CAST(doc_id AS VARCHAR) AS t FROM documents), "
        "lines AS (SELECT doc_id, u.pos, u.line FROM a, unnest("
        "[{'pos': i, 'line': string_split(t, chr(10))[i]} "
        "FOR i IN generate_series(1, len(string_split(t, chr(10))))]"
        ") AS s(u)), "
        "freq AS (SELECT trim(line) AS tl, count(DISTINCT doc_id) AS df "
        "FROM lines WHERE trim(line) != '' GROUP BY 1), "
        "nd AS (SELECT count(*) AS n_docs FROM documents), "
        "common AS (SELECT tl FROM freq, nd "
        "WHERE df >= greatest(2, CAST(ceil(0.01 * n_docs) AS BIGINT))), "
        "marked AS (SELECT doc_id, pos, line, "
        "trim(line) != '' AND trim(line) IN (SELECT tl FROM common) "
        "AS dropped FROM lines) "
        "SELECT doc_id, coalesce(string_agg(line, chr(10) ORDER BY pos) "
        "FILTER (WHERE NOT dropped), '') AS text_clean, "
        "count(*) AS n_lines, "
        "sum(CAST(dropped AS BIGINT)) AS n_removed "
        "FROM marked GROUP BY doc_id"
    ).fetchall()
    exp = {r[0]: (r[1], r[2], r[3]) for r in oracle}

    assert set(out) == set(exp)
    for doc_id in exp:
        assert out[doc_id] == exp[doc_id], f"doc {doc_id}"
    # the injected header and the 3-way footer are actually removed
    assert all(v[2] >= 2 for v in out.values())


def _py_canonical_url(url: str) -> str:
    """Independent canonicalization oracle built on urllib.parse, per
    the operator's documented semantics: lowercase scheme+host, drop
    fragment and default :80/:443 port, strip tracking query params,
    no trailing '?'/'&'."""
    parts = urlsplit(url)
    netloc = parts.netloc.lower()
    if netloc.endswith(":80") or netloc.endswith(":443"):
        netloc = netloc.rsplit(":", 1)[0]
    tracking = re.compile(
        r"^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref_src)="
    )
    kept = [
        p
        for p in parts.query.split("&")
        if p != "" and not tracking.match(p)
    ]
    return urlunsplit(
        (parts.scheme.lower(), netloc, parts.path, "&".join(kept), "")
    )


ADVERSARIAL_URLS = [
    "HTTPS://Example.COM:443/A/B?utm_source=x&id=1&fbclid=zz#frag",
    "http://example.com:80/",
    "http://example.com/path?utm_campaign=a",
    "https://example.com/p?id=2&utm_medium=email&gclid=G123",
    "https://example.com/p?utm_source=only",
    "https://example.com/p?",
    "https://example.com/p#only-frag",
    "FTP://Mixed.Case.Host/File.TXT",
    "https://example.com/p?keep=1&ref_src=twsrc&keep2=2",
    "http://example.com:8080/nonstandard?x=1",
]


def test_canonical_url_python_parity(spark):
    from marc2rdf_spark.operators.curation import canonical_url

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    synth = docs.select(
        F.concat(
            F.lit("HTTPS://WWW.Example.ORG:443/doc/"),
            F.col("doc_id"),
            F.lit("?utm_source=s"),
            F.col("doc_id") % 5,
            F.lit("&page="),
            F.col("doc_id") % 7,
            F.lit("&fbclid=F"),
            F.col("doc_id"),
            F.lit("#sec"),
            F.col("doc_id") % 2,
        ).alias("url")
    )
    fixed = spark.createDataFrame(
        [(u,) for u in ADVERSARIAL_URLS], "url string"
    )
    got = [
        (r.url, r.c)
        for r in synth.unionAll(fixed)
        .select("url", canonical_url(F.col("url")).alias("c"))
        .collect()
    ]
    for url, c in got:
        assert c == _py_canonical_url(url), url


# ---------------------------------------------------------------- #
# seeded_shard: pure-Python XXH64 replica of Spark's xxhash64(long) #
# ---------------------------------------------------------------- #

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte long, matching Spark's XXH64.hashLong."""
    h = (seed + _P5 + 8) & _M
    k1 = (struct.unpack("<Q", struct.pack("<q", value))[0]) & _M
    k1 = _rotl((k1 * _P2) & _M, 31)
    k1 = (k1 * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int, matching Spark's XXH64.hashInt —
    IntegerType columns (e.g. a small Python-int literal) take this
    path, NOT hashLong."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


_I32 = 1 << 31


def _spark_xxhash64(cols: list[tuple[int, str]], seed: int = 42) -> int:
    """Spark's xxhash64(c1, c2, ...): fold left, each column hashed
    with the running hash as seed; dispatch by the column's Spark TYPE
    ('int' or 'long' — a Python-int literal is IntegerType when it
    fits in 32 bits, LongType otherwise).  Returns SIGNED 64-bit,
    like the Spark function."""
    h = seed
    for c, typ in cols:
        if typ == "int":
            h = _xxh64_int(c, h)
        else:
            h = _xxh64_long(c, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def _lit_type(v: int) -> str:
    return "int" if -_I32 <= v < _I32 else "long"


def test_seeded_shard_python_xxh64_parity(spark):
    from marc2rdf_spark.operators.curation import seeded_shard

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_shards, seed = 16, 7
    rows = seeded_shard(docs, n_shards, seed=seed).collect()
    assert len(rows) == docs.count()
    o_seed = seed * 1315423911 + 1
    for r in rows:
        h = _spark_xxhash64([(seed, _lit_type(seed)), (r.doc_id, "long")])
        o = _spark_xxhash64(
            [(o_seed, _lit_type(o_seed)), (r.doc_id, "long")]
        )
        # Spark pmod == Python % for a positive modulus (non-negative)
        assert r.shard == h % n_shards
        assert 0 <= r.shard < n_shards
        assert r.ord_key == o


def test_seeded_shard_balance(spark):
    """Shard sizes concentrate around n/k — the property that makes
    shard files uniform at 100 TB.  Bound: no shard above 2x the mean
    at 500 docs / 16 shards (loose enough to never flake, tight enough
    to catch a broken hash)."""
    from marc2rdf_spark.operators.curation import seeded_shard

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sizes = {
        r.shard: r.n
        for r in seeded_shard(docs, 16, seed=3)
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n = sum(sizes.values())
    assert len(sizes) == 16
    assert max(sizes.values()) <= math.ceil(2 * n / 16)
