"""Property-based parity for the exact-string-semantics seam: the
pure-Python twins (``textsem.py_urlize`` / ``py_is_uri`` /
``py_ruby_strip`` — what the oracle converter executes) and the Column
expressions (``exprs.urlize`` / ``is_uri`` / ``ruby_strip`` — what the
Spark compiler executes) must agree on ARBITRARY unicode input, not
just the fixture corpus.  Any divergence here silently splits the
oracle from the compiled plan, which is exactly the failure mode the
golden-parity strategy cannot see (both sides read the same seam).

Hypothesis drives the generation; each example list becomes one Spark
job over a small DataFrame, so examples are batched to keep the suite
fast."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marc2rdf_spark.functions import exprs
from marc2rdf_spark.functions.textsem import (
    py_is_uri,
    py_ruby_strip,
    py_urlize,
)

# Spark cannot round-trip lone surrogates; NUL upsets the JVM string
# bridge in places unrelated to the semantics under test.
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=60,
)


def _column_eval(spark, values, col_fn, out_type="string"):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.o for r in df.select(col_fn(F.col("s")).alias("o")).collect()]


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_urlize_python_equals_column(spark, values):
    got = _column_eval(spark, values, exprs.urlize)
    want = [py_urlize(v) for v in values]
    assert got == want


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_ruby_strip_python_equals_column(spark, values):
    got = _column_eval(spark, values, exprs.ruby_strip)
    want = [py_ruby_strip(v) for v in values]
    assert got == want


URIISH = st.one_of(
    TEXT,
    st.builds(
        lambda scheme, host, rest: f"{scheme}://{host}{rest}",
        st.sampled_from(["http", "https", "ftp", "x+y.z-1", "9bad", ""]),
        st.text(max_size=10),
        st.text(max_size=15),
    ),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(URIISH, min_size=1, max_size=40))
def test_is_uri_python_equals_column(spark, values):
    got = _column_eval(
        spark, values, lambda c: F.coalesce(exprs.is_uri(c), F.lit(False))
    )
    want = [py_is_uri(v) for v in values]
    assert got == want
