"""End-to-end Spark pipeline tests: synthesis -> extraction (byte
identity) -> parse -> compiled mapping plan, cross-checked against the
independent pure-Python oracle (precision AND recall — target exact,
gate >= 0.95 per BASELINE.json)."""

import pytest

from marc2rdf_spark.compiler import MappingCompiler
from marc2rdf_spark.config import Library, load_dummy_mapping, load_skeleton_mapping
from marc2rdf_spark.oracle.converter import convert_records
from marc2rdf_spark.sources.extract import extract_and_parse, latest_pages
from marc2rdf_spark.sources.synth import expected_records, gen_page, synth_web_pages

N_PAGES = 44
TRIPLE_COLS = ["subj", "pred", "obj", "obj_is_uri", "lang", "dtype"]


@pytest.fixture(scope="module")
def records_df(spark):
    pages = synth_web_pages(spark, N_PAGES, partitions=4)
    df = extract_and_parse(pages)
    df.cache()
    df.count()
    return df


def _spark_triples(df, mapping):
    comp = MappingCompiler(mapping, Library())
    triples = comp.convert(df).dropDuplicates(TRIPLE_COLS)
    return {tuple(r) for r in triples.select(*TRIPLE_COLS).collect()}


def _oracle_triples(mapping):
    return {
        tuple(t)
        for t in convert_records(expected_records(N_PAGES), mapping, Library())
    }


def _pr(got, exp):
    tp = len(got & exp)
    return tp / max(len(got), 1), tp / max(len(exp), 1)


def test_extraction_byte_identity(spark, records_df):
    """Extracted record_xml must be an exact substring of the page text
    (BASELINE.json per-row invariant)."""
    pages = synth_web_pages(spark, N_PAGES, partitions=4)
    latest = latest_pages(pages).withColumnRenamed("text", "page_text")
    joined = records_df.join(latest, "url")
    bad = joined.filter(
        ~joined.page_text.contains(joined.record_xml)
    ).count()
    assert bad == 0
    assert records_df.count() == N_PAGES  # stale duplicates dropped


def test_extraction_colocated_lww_parity(spark):
    """urls_colocated=True (in-partition LWW for url-bucketed layouts)
    must produce exactly the shuffle path's records when urls ARE
    co-located."""
    pages = synth_web_pages(spark, 30, partitions=3).repartition(4, "url")
    shuffle_path = {
        (r.url, r.record_xml)
        for r in extract_and_parse(pages).select("url", "record_xml").collect()
    }
    colocated = {
        (r.url, r.record_xml)
        for r in extract_and_parse(pages, urls_colocated=True)
        .select("url", "record_xml")
        .collect()
    }
    assert colocated == shuffle_path and len(colocated) == 30


def test_last_write_wins(spark):
    """Stale duplicate crawls (earlier warc_ts) must lose."""
    pages = synth_web_pages(spark, 11, partitions=2)
    assert pages.count() > 11  # stale rows exist
    latest = latest_pages(pages)
    assert latest.count() == 11
    # the stale variant has no datafields -> fresh text contains one
    assert latest.filter(~latest.text.contains("<datafield")).count() == 0


def test_dummy_mapping_exact_parity(records_df):
    mapping = load_dummy_mapping()
    got = _spark_triples(records_df, mapping)
    exp = _oracle_triples(mapping)
    precision, recall = _pr(got, exp)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} miss={list(exp - got)[:3]} "
        f"extra={list(got - exp)[:3]}"
    )


def test_skeleton_mapping_exact_parity(records_df):
    """Full 69-tag NORMARC skeleton: conditions, indicators, combine,
    substr/008, regex_substitute, urlize, relations, lookahead keys."""
    mapping = load_skeleton_mapping()
    got = _spark_triples(records_df, mapping)
    exp = _oracle_triples(mapping)
    precision, recall = _pr(got, exp)
    assert precision >= 0.95 and recall >= 0.95  # BASELINE gate
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} miss={list(exp - got)[:3]} "
        f"extra={list(got - exp)[:3]}"
    )


def test_synth_determinism():
    a, b = gen_page(17), gen_page(17)
    assert a == b


def test_three_way_parity_unrolled_vs_hybrid_vs_oracle(records_df):
    """Three independent implementations of the mapping algebra must
    agree exactly on the full skeleton mapping: the unrolled
    expression-tree compiler, the production hybrid codegen compiler,
    and the pure-Python oracle (VERDICT r1 #8 — makes unrolled.py pay
    rent as a genuinely independent cross-check)."""
    from marc2rdf_spark.compiler.unrolled import UnrolledMappingCompiler

    mapping = load_skeleton_mapping()
    unrolled = UnrolledMappingCompiler(mapping, Library()).convert(records_df)
    got_unrolled = {
        tuple(r)
        for r in unrolled.dropDuplicates(TRIPLE_COLS)
        .select(*TRIPLE_COLS)
        .collect()
    }
    got_hybrid = _spark_triples(records_df, mapping)
    exp = _oracle_triples(mapping)
    assert got_unrolled == got_hybrid == exp
