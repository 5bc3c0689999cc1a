"""Pin the scaling-bench measurement-protocol fingerprint semantics.

The pool in tools/scaling_bench.py keys on measured_fp: a hash of the
pipeline sources plus ONLY the bench sections that can move a measured
wall (WORKER program, corpus synthesis, pretouch, steal reader,
launch/timing harness).  These tests pin the invariants the pooling
rule depends on: reporting-prose edits must not change the hash,
protocol edits must, and a missing protocol section must hard-error
instead of silently hashing less (which would let protocol code drift
out of the fingerprint and pool walls across different measurements).
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from scaling_bench import (  # noqa: E402
    _MEASURED_BENCH_SECTIONS,
    _PIPELINE_FILES,
    bench_measured_source,
    measured_path_fingerprint,
    measured_protocol_fingerprint,
)

BENCH_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "scaling_bench.py",
)


def _bench_source() -> str:
    with open(BENCH_PATH) as f:
        return f.read()


def test_all_protocol_sections_extracted():
    src = bench_measured_source(_bench_source())
    for name in _MEASURED_BENCH_SECTIONS:
        assert name in src


def test_reporting_edit_does_not_change_measured_source():
    # appending reporting/pooling code after the protocol sections (the
    # shape of the r4 taint-rule edit that orphaned the r4 pool) leaves
    # the measured source byte-identical
    src = _bench_source()
    edited = src + "\n\nREPORT_ONLY_CONSTANT = 'prose change'\n"
    assert bench_measured_source(edited) == bench_measured_source(src)


def test_protocol_edit_changes_measured_source():
    src = _bench_source()
    assert 'WORKER = r"""' in src
    edited = src.replace(
        'WORKER = r"""', 'WORKER = r"""\n# timing-relevant change', 1
    )
    assert bench_measured_source(edited) != bench_measured_source(src)


def test_missing_section_is_hard_error():
    src = _bench_source()
    edited = src.replace("def pretouch(", "def pretouch_renamed(", 1)
    with pytest.raises(RuntimeError, match="pretouch"):
        bench_measured_source(edited)


def test_pipeline_files_exclude_harness_and_exist():
    assert "tools/scaling_bench.py" not in _PIPELINE_FILES
    assert len(_PIPELINE_FILES) == 13
    # both fingerprints are computable against the working tree (a
    # renamed pipeline file must fail loudly, tested by the functions'
    # own FileNotFoundError contract)
    assert len(measured_protocol_fingerprint()) == 12
    assert len(measured_path_fingerprint()) == 12


def test_backfill_matches_runtime_fingerprint_on_clean_tree():
    # measured_fp computed from git blobs at HEAD must equal the
    # runtime worktree computation when the tree is clean for the
    # measured files — the property that makes historical pool
    # membership independently verifiable
    import subprocess

    from backfill_measured_fp import measured_fp_at

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--"]
        + list(_PIPELINE_FILES)
        + ["tools/scaling_bench.py"],
        cwd=repo,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if dirty:
        pytest.skip("measured files dirty in worktree")
    assert measured_fp_at("HEAD") == measured_protocol_fingerprint()
