"""Deterministic web_pages synthesis (FIXTURES.md §1; seed-fixed, no
external data).

Each page embeds one MARCXML record (seeded permutation of the 11
reference fixture records) in Common-Crawl-style boilerplate.  The same
``gen_page(i)`` function runs pure-Python (golden generation, tests) and
inside ``mapInPandas`` workers (distributed synthesis at bench scale) —
page i is byte-identical wherever it is produced.

Duplicate-url rows: every DUP_EVERY-th page also yields a STALE earlier
crawl of the same url with degraded content; the extract stage's
last-write-wins by warc_ts must discard it (SURVEY.md §2.10).
"""

from __future__ import annotations

import copy
import datetime as dt
import os
import random
from collections.abc import Iterator

from ..marc import (
    ControlField,
    Record,
    find_record_strings,
    parse_record_xml,
    record_to_xml,
)

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURES_DIR = os.path.join(_HERE, "fixtures")

BASE_TS = dt.datetime(2012, 5, 21, 0, 0, 0)
DUP_EVERY = 10
URL_FMT = "https://crawl.example.org/rec/{lib}/{rec_id}"

_BASE_RECORDS: list[str] | None = None


def base_record_strings() -> list[str]:
    """The 10 normarc + 1 bsmarc fixture records, raw."""
    global _BASE_RECORDS
    if _BASE_RECORDS is None:
        recs: list[str] = []
        for name in ("example.normarc.xml", "example.bsmarc.xml"):
            with open(os.path.join(FIXTURES_DIR, name), encoding="utf-8") as f:
                recs.extend(find_record_strings(f.read()))
        _BASE_RECORDS = recs
    return _BASE_RECORDS


def _set_record_id(rec: Record, rec_id: str) -> None:
    for f in rec.fields:
        if f.is_control and f.tag == "001":
            f.value = rec_id
            return
    rec.fields.insert(0, ControlField("001", rec_id))


def variant_record(i: int) -> Record:
    """Deterministic record variant for page index i."""
    bases = base_record_strings()
    rec = parse_record_xml(bases[i % len(bases)])
    _set_record_id(rec, str(7000000 + i))
    rng = random.Random(42 + i)
    kind = (i // len(bases)) % 4
    if kind == 1:
        # shuffled field order (triple set must be order-insensitive)
        datafields = [f for f in rec.fields if not f.is_control]
        controls = [f for f in rec.fields if f.is_control]
        rng.shuffle(datafields)
        rec.fields = controls + datafields
    elif kind == 2:
        # repeat a repeatable field (dedup must collapse identical triples)
        for f in rec.fields:
            if not f.is_control and f.tag in ("691", "850", "650", "653"):
                rec.fields.append(copy.deepcopy(f))
                break
    elif kind == 3:
        # accent-folded title exercises urlize (string_replace.rb map)
        for f in rec.fields:
            if not f.is_control and f.tag == "245":
                for sf in f.subfields:
                    if sf.code == "a":
                        sf.value = sf.value + " Ærbødig Åré"
        # and a repeated-subfield case on 691 ($x twice)
    return rec


def _record_lang(rec: Record) -> str:
    for f in rec.fields:
        if f.is_control and f.tag == "008":
            v = f.value
            return v[35:38].strip() or "und" if len(v) >= 38 else "und"
    return "und"


def gen_page(i: int, stale: bool = False) -> dict:
    """One deterministic web_pages row for index i."""
    rec = variant_record(i)
    rec_id = str(7000000 + i)
    if stale:
        # degraded earlier crawl: drop the datafields entirely
        rec = Record(leader=rec.leader, fields=[f for f in rec.fields if f.is_control])
    xml = record_to_xml(rec)
    text = (
        f"<!-- commoncrawl-style page {i} -->\n"
        f"<h1>Bibliographic record {rec_id}</h1>\n"
        f"{xml}\n"
        f"<p>retrieved {i}</p>"
    )
    ts = BASE_TS + dt.timedelta(seconds=i) - (dt.timedelta(days=1) if stale else dt.timedelta())
    return {
        "url": URL_FMT.format(lib=1, rec_id=rec_id),
        "warc_ts": ts,
        "html": ("<html><body><pre>" + text + "</pre></body></html>").encode(),
        "text": text,
        "lang": _record_lang(rec),
    }


def gen_tombstone_page(i: int) -> dict:
    """A later crawl of page i's url carrying an OAI-style
    deleted-record envelope instead of the record (the reference's
    `header status="deleted"` path, scheduler.rb:379-383) — drives the
    U6 tombstone purge."""
    rec_id = str(7000000 + i)
    ts = BASE_TS + dt.timedelta(days=2, seconds=i)
    text = (
        f"<!-- oai deleted-record response for {rec_id} -->\n"
        "<OAI-PMH><ListRecords><record>"
        f'<header status="deleted"><identifier>oai:example:{rec_id}'
        f"</identifier><datestamp>{ts.isoformat()}</datestamp></header>"
        "</record></ListRecords></OAI-PMH>"
    )
    return {
        "url": URL_FMT.format(lib=1, rec_id=rec_id),
        "warc_ts": ts,
        "html": ("<html><body><pre>" + text + "</pre></body></html>").encode(),
        "text": text,
        "lang": "und",
    }


def gen_oai_mixed_page(live_i: int, dead_i: int) -> dict:
    """One OAI ListRecords response page carrying BOTH a live record
    envelope (header + metadata, like spec/example.oairesponse.xml) and
    a deleted-record envelope — the real harvest shape: the reference
    walks the records of one response individually (scheduler.rb:
    376-383), converting live ones and deleting tombstoned ones."""
    live_rec = variant_record(live_i)
    live_id, dead_id = str(7000000 + live_i), str(7000000 + dead_i)
    ts = BASE_TS + dt.timedelta(days=2, seconds=live_i)
    # namespace-prefix the metadata record like a real marcxchange OAI
    # response (spec/example.oairesponse.xml): the envelope's own
    # <record> is unprefixed, the nested MARC record is prefixed —
    # that asymmetry is what delimits the outer envelope
    inner = (
        record_to_xml(live_rec)
        .replace("<record", "<marc:record")
        .replace("</record>", "</marc:record>")
    )
    text = (
        "<OAI-PMH><ListRecords>"
        f"<record><header><identifier>oai:example:{live_id}</identifier>"
        f"<datestamp>{ts.isoformat()}</datestamp></header>"
        f"<metadata>{inner}</metadata></record>"
        f'<record><header status="deleted"><identifier>oai:example:'
        f"{dead_id}</identifier><datestamp>{ts.isoformat()}</datestamp>"
        "</header></record>"
        "</ListRecords></OAI-PMH>"
    )
    return {
        "url": URL_FMT.format(lib=1, rec_id=live_id),
        "warc_ts": ts,
        "html": ("<html><body><pre>" + text + "</pre></body></html>").encode(),
        "text": text,
        "lang": "und",
    }


def gen_pages(start: int, end: int) -> Iterator[dict]:
    """All rows for page indices [start, end): fresh rows plus stale
    duplicates every DUP_EVERY-th index."""
    for i in range(start, end):
        yield gen_page(i)
        if i % DUP_EVERY == 0:
            yield gen_page(i, stale=True)


def expected_records(n_pages: int) -> list[Record]:
    """The record set the pipeline must recover after last-write-wins —
    oracle input for golden-triple generation."""
    return [variant_record(i) for i in range(n_pages)]


# ---------------------------------------------------------------------------
# Spark-distributed synthesis
# ---------------------------------------------------------------------------

def synth_web_pages(
    spark, n_pages: int, partitions: int | None = None, start: int = 0
):
    """Distributed deterministic synthesis via mapInPandas over a range —
    no driver-side materialization, scales to bench sizes.  ``start``
    offsets the page-index range (shard [start, start+n_pages) — page i
    is byte-identical regardless of which shard/process generates it)."""
    import pandas as pd

    from ..schema import WEB_PAGES_SCHEMA

    # Default partitioning must keep every core busy through the whole
    # narrow synth->extract->convert pass (it only widens at the dedup
    # shuffle): at least 2x the scheduler's parallelism, bounded by
    # ~250 pages/task so task overhead stays amortized.
    if partitions is None:
        par = spark.sparkContext.defaultParallelism
        partitions = min(max(8, n_pages // 250), max(2 * par, 8))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = []
            for i in ids:
                rows.extend(gen_pages(i, i + 1))
            yield pd.DataFrame(rows)

    return (
        spark.range(start, start + n_pages, 1, partitions)
        .mapInPandas(gen, schema=WEB_PAGES_SCHEMA)
    )
