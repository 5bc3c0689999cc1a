"""spark-submit entry point for the corpus-curation pipeline: the
training-data counterpart of convert_job.py, composing the gates a
pre-training corpus pass runs over a documents table.

  cd /root/repo && zip -qr /tmp/marc2rdf_spark.zip marc2rdf_spark fixtures
  spark-submit --py-files /tmp/marc2rdf_spark.zip jobs/curate_job.py \
      --docs /data/documents --out /data/curated \
      [--block src0,src7] [--mix en=0.5,de=0.25] [--scrub-pii] \
      [--max-top-word-frac 0.3] [--cores 8]

Stage order is the cheap-first 100 TB discipline: the blocklist
anti-join and the zero-shuffle mix sample prune rows BEFORE the
clean_corpus gates and the dedup keeper shuffle run, so every
downstream stage sees only survivors; the repetition gate joins its
two map-side-combined aggregations against that already-pruned set,
and the optional PII scrub is a final narrow projection over what
remains.  Writes the surviving (doc_id, text[, clean_text]) set as
parquet plus a JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_rates(s: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in s.split(","):
        if part:
            code, _, r = part.partition("=")
            out[code] = float(r)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="documents table path (parquet/iceberg): "
                         "doc_id, text, lang, source")
    ap.add_argument("--out", required=True)
    ap.add_argument("--block", default="",
                    help="comma-separated source blocklist "
                         "(exact or subdomain match)")
    ap.add_argument("--mix", default="",
                    help="per-language keep rates, e.g. en=0.5,de=0.25; "
                         "empty = keep every language")
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--max-top-word-frac", type=float, default=None,
                    help="drop docs whose most frequent word exceeds "
                         "this fraction (Gopher repetition gate)")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=80)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from marc2rdf_spark.operators.curation import (
        mix_sample,
        pii_scrub,
        repetition_stats,
        source_blocklist_filter,
    )
    from marc2rdf_spark.operators.dedup import duplicate_drop_list
    from marc2rdf_spark.session import get_spark

    spark = get_spark(app_name="marc2rdf_curate", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    from marc2rdf_spark.sources.catalog import read_table

    docs = read_table(spark, args.docs)
    n_in = docs.count()

    if args.block:
        keep_ids = source_blocklist_filter(docs, args.block.split(","))
        docs = docs.join(keep_ids.select("doc_id"), "doc_id", "semi")
    if args.mix:
        sampled = mix_sample(docs, _parse_rates(args.mix))
        docs = docs.join(sampled.select("doc_id"), "doc_id", "semi")

    # exact-dedup drop-list: join-back on fingerprint, no per-group
    # arrays (the scale path — see operators/dedup.py)
    drops = duplicate_drop_list(docs).select("doc_id")
    docs = docs.join(drops, "doc_id", "anti")

    if args.max_top_word_frac is not None:
        rep = repetition_stats(docs)
        ok = rep.filter(
            (F.col("top_word_frac") <= args.max_top_word_frac)
            & (F.col("n_words") >= args.min_tokens)
            & (F.col("n_words") <= args.max_tokens)
        ).select("doc_id")
        docs = docs.join(ok, "doc_id", "semi")

    if args.scrub_pii:
        scrubbed = pii_scrub(docs)
        out = docs.join(scrubbed, "doc_id").select(
            "doc_id", "lang", "source",
            F.col("clean_text").alias("text"),
            "n_emails", "n_ipv4", "n_phones",
        )
    else:
        out = docs.select("doc_id", "lang", "source", "text")

    out.write.mode("overwrite").parquet(args.out)
    kept = spark.read.parquet(args.out).count()
    dt = time.time() - t0
    print(json.dumps({
        "docs_in": n_in,
        "docs_kept": kept,
        "kept_frac": round(kept / max(n_in, 1), 4),
        "seconds": round(dt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
