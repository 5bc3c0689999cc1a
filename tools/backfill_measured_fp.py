"""Backfill `measured_fp` onto historical BENCH/scaling_runs.jsonl rows.

Each scaling run records the git rev it ran at.  The measurement
fingerprint (see tools/scaling_bench.py:measured_protocol_fingerprint)
is a pure function of file CONTENTS — the 13 pipeline sources the
bench executes plus the bench's own measurement-protocol sections — so
it can be recomputed for any historical run from `git show
<rev>:<file>`, without checking anything out.  That makes pool
membership of an old run independently verifiable: anyone can re-run
this tool and diff the jsonl.

Rows whose rev lacks one of the files, or whose bench source predates
one of the named protocol sections, get `measured_fp: null` and can
never pool (the conservative direction).

Usage: python tools/backfill_measured_fp.py [--dry-run]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

from scaling_bench import _PIPELINE_FILES, bench_measured_source  # noqa: E402

RUNLOG = os.path.join(HERE, "BENCH", "scaling_runs.jsonl")


def git_show(rev: str, rel: str) -> bytes | None:
    p = subprocess.run(
        ["git", "show", f"{rev}:{rel}"], cwd=HERE, capture_output=True
    )
    return p.stdout if p.returncode == 0 else None


def measured_fp_at(rev: str) -> str | None:
    h = hashlib.md5()
    for rel in _PIPELINE_FILES:
        blob = git_show(rev, rel)
        if blob is None:
            return None
        h.update(blob)
    bench_src = git_show(rev, "tools/scaling_bench.py")
    if bench_src is None:
        return None
    try:
        h.update(bench_measured_source(bench_src.decode()).encode())
    except (RuntimeError, SyntaxError):
        # a protocol section did not exist at that rev -> cannot pool
        return None
    return h.hexdigest()[:12]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    rows = []
    with open(RUNLOG) as f:
        for line in f:
            rows.append(json.loads(line))
    cache: dict[str, str | None] = {}
    changed = 0
    for r in rows:
        rev = r.get("git_rev") or "unknown"
        if rev not in cache:
            cache[rev] = measured_fp_at(rev) if rev != "unknown" else None
        fp = cache[rev]
        if r.get("measured_fp") != fp:
            print(
                f"{r['ts']} rev={rev}: measured_fp "
                f"{r.get('measured_fp')} -> {fp}"
            )
            r["measured_fp"] = fp
            changed += 1
    print(f"{changed} of {len(rows)} rows updated")
    if changed and not args.dry_run:
        with open(RUNLOG, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {RUNLOG}")


if __name__ == "__main__":
    main()
