"""Randomized parity for the curation operators: a seeded random
corpus (word salads with controlled duplication, whitespace noise and
embedded PII) checked row-for-row against independent pure-Python
models of each operator's contract.  Complements the hand-computed
cases (test_curation.py) and the DuckDB oracle (check_contract) with
inputs neither was written around."""

import hashlib
import random
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

VOCAB = ["a", "bb", "ccc", "dd", "e", "spark", "row", "x1", "-", "@@"]


def _round4(x: float) -> float:
    """Spark/DuckDB round() is HALF_UP; Python's built-in round() is
    banker's — 9/32 = 0.28125 rounds to .2813 there and .2812 here, so
    the model must use HALF_UP explicitly."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def _rand_corpus(n=200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 30)
        words = [rng.choice(VOCAB) for _ in range(k)]
        # whitespace noise: tabs, runs of spaces, leading/trailing
        sep = lambda: rng.choice([" ", "  ", "\t", " \t "])  # noqa: E731
        text = sep().join(words)
        if rng.random() < 0.3:
            text = " " + text + "\t"
        if rng.random() < 0.25:  # embed PII
            text += f" mail u{i}@ex{i % 3}.org or 10.1.{i % 256}.9 "
        if rng.random() < 0.15:
            text += f" call +47 99 {1000 + i} end"
        rows.append((i, text, rng.choice(["en", "xx"]), f"s{i % 7}"))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _rand_corpus()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    return rows, df


def _norm_words(text):
    t = re.sub(r"\s+", " ", text.strip().lower())
    return t.split(" ") if t else []


def test_repetition_stats_fuzz(corpus):
    from marc2rdf_spark.operators.curation import repetition_stats

    rows, df = corpus
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert len(got) == len(rows)
    for doc_id, text, _lang, _src in rows:
        words = _norm_words(text)
        grams = [
            f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
        ]
        wc, gc = Counter(words), Counter(grams)
        r = got[doc_id]
        assert r.n_words == len(words)
        if words:
            assert r.top_word_frac == _round4(max(wc.values()) / len(words))
            dup = sum(c for c in wc.values() if c > 1)
            assert r.dup_word_frac == _round4(dup / len(words))
        else:
            assert r.top_word_frac == 0.0
        if grams:
            dup2 = sum(c for c in gc.values() if c > 1)
            assert r.dup_2gram_frac == _round4(dup2 / len(grams))
        else:
            assert r.dup_2gram_frac == 0.0


def test_pii_scrub_fuzz(corpus):
    from marc2rdf_spark.operators.curation import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_scrub,
    )

    rows, df = corpus
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    for doc_id, text, _lang, _src in rows:
        t1 = re.sub(EMAIL_RE, "<EMAIL>", text)
        t2 = re.sub(IPV4_RE, "<IP>", t1)
        t3 = re.sub(PHONE_RE, "<PHONE>", t2)
        r = got[doc_id]
        assert r.clean_text == t3, doc_id
        assert r.n_emails == len(re.findall(EMAIL_RE, text))
        assert r.n_ipv4 == len(re.findall(IPV4_RE, t1))
        assert r.n_phones == len(re.findall(PHONE_RE, t2))


def test_mix_sample_fuzz(corpus):
    from marc2rdf_spark.operators.curation import mix_sample

    rows, df = corpus
    rates = {"en": 0.37}
    kept = {r.doc_id for r in mix_sample(df, rates).collect()}
    for doc_id, _text, lang, _src in rows:
        h = (
            int(
                hashlib.md5(f"mix1{doc_id}".encode()).hexdigest()[:15], 16
            )
            % 10000
        )
        expect = lang == "en" and h < 3700
        assert (doc_id in kept) == expect, doc_id


def test_boilerplate_score_fuzz(corpus):
    from marc2rdf_spark.operators.curation import boilerplate_score

    rows, df = corpus
    per_doc = {}
    doc_freq: Counter = Counter()
    for doc_id, text, _lang, _src in rows:
        words = _norm_words(text)
        grams = [f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)]
        per_doc[doc_id] = grams
        doc_freq.update(set(grams))
    boiler = {g for g, c in doc_freq.items() if c > 0.2 * len(rows)}
    got = {r.doc_id: r for r in boilerplate_score(df, 0.2).collect()}
    assert len(got) == len(rows)
    for doc_id, grams in per_doc.items():
        nb = sum(1 for g in grams if g in boiler)
        r = got[doc_id]
        assert r.n_grams2 == len(grams)
        assert r.n_boiler == nb
        assert r.boiler_frac == (
            _round4(nb / len(grams)) if grams else 0.0
        )


def test_ngram_counts_fuzz(corpus):
    from marc2rdf_spark.operators.curation import ngram_counts

    rows, df = corpus
    gc: Counter = Counter()
    for _doc_id, text, _lang, _src in rows:
        words = _norm_words(text)
        gc.update(f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1))
    expect = sorted(gc.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r.gram, r.n) for r in ngram_counts(df, k=25).collect()]
    assert got == expect
