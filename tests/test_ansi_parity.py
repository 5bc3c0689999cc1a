"""Default-session (ANSI-on) parity gate.

The driver's correctness harness builds a vanilla Spark 4.x session,
where ``spark.sql.ansi.enabled`` defaults to TRUE and
``spark.sql.mapKeyDedupPolicy`` defaults to EXCEPTION — while the
repo's own ``get_spark`` (session.py) runs ANSI off / LAST_WIN.  Round
2 shipped an operator (connected_components' sum(xxhash64) checksum)
that passed the whole local suite and then crashed in the driver with
ARITHMETIC_OVERFLOW, because nothing local ever executed under the
driver's session defaults.

This module closes that gap: every contract query from
``__spark_entry__.queries()`` is executed under driver-default SQL
confs (flipped at runtime on the shared session — both confs are
runtime-settable) against sf0.001 data.  Any operator that silently
depends on a non-default session conf fails HERE before it fails in
the driver.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SF_DIR_TINY", "/root/testdata/sf0.001")

# Confs where the driver's default session differs from get_spark's.
_DRIVER_DEFAULTS = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.mapKeyDedupPolicy": "EXCEPTION",
}


@pytest.fixture()
def spark_ansi(spark):
    saved = {}
    for k, v in _DRIVER_DEFAULTS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


_QUERIES = sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_query_runs_under_ansi(spark_ansi, name, fn):
    df = fn(spark_ansi, SF_DIR)
    # Execution (not just plan analysis) is the point: ANSI failures are
    # runtime ArithmeticException/CastException, not analysis errors.
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_runs_under_ansi(spark_ansi):
    df = entrymod.entry(spark_ansi)
    assert df.count() > 0
