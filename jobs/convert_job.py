"""spark-submit entry point (north rule: `spark-submit --py-files`).

Package the library and run the resumable pipeline:

  cd /root/repo && zip -qr /tmp/marc2rdf_spark.zip marc2rdf_spark fixtures
  spark-submit --py-files /tmp/marc2rdf_spark.zip jobs/convert_job.py \
      --pages /data/web_pages --out /data/kg --run-id run1 \
      --mapping skeleton --buckets 4096 [--link] [--synth-pages 20000]

On a real cluster --pages is the Iceberg/parquet web_pages table; with
--synth-pages the deterministic synthetic corpus is generated
distributedly instead (benchmarks, smoke tests).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="web_pages table path (parquet/iceberg)")
    ap.add_argument("--synth-pages", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--mapping", default="skeleton")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--link", action="store_true",
                    help="run entity linking + canonicalization")
    ap.add_argument("--extract-id", default=None,
                    help="reuse another run's raw-records staging zone "
                         "(mapping-change replay without re-extraction)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from marc2rdf_spark.plans.materialize import run_resumable
    from marc2rdf_spark.session import get_spark
    from marc2rdf_spark.sources.synth import synth_web_pages

    spark = get_spark(app_name=f"marc2rdf_convert_{args.run_id}",
                      cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    if args.synth_pages:
        pages = synth_web_pages(spark, args.synth_pages)
    elif args.pages:
        from marc2rdf_spark.sources.catalog import read_table

        # parquet path in the sandbox; iceberg:<cat.db.table> /
        # table:<ident> resolve through the session catalog on a real
        # cluster (snapshot isolation + hidden-partition pruning)
        pages = read_table(spark, args.pages)
    else:
        ap.error("need --pages or --synth-pages")

    triples = run_resumable(
        spark, pages, args.out, args.run_id,
        mapping=args.mapping, n_buckets=args.buckets,
        extract_id=args.extract_id,
    )

    if args.link:
        from marc2rdf_spark.operators.components import (
            canonicalize_triples,
            connected_components,
        )
        from marc2rdf_spark.operators.linking import (
            link_mentions,
            mention_nodes,
            sameas_edges,
        )

        auth_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "golden", "authorities.parquet",
        )
        mentions = mention_nodes(
            triples,
            ["http://def.bibsys.no/xmlns/radatana/1.0#catalogueName"],
        )
        links = link_mentions(mentions, spark.read.parquet(auth_path))
        comps = connected_components(sameas_edges(links))
        triples = canonicalize_triples(triples, comps).dropDuplicates(
            ["subj", "pred", "obj", "lang", "dtype"]
        )
        triples.write.mode("overwrite").parquet(f"{args.out}/triples_canonical")
        # count what was committed — not a recompute of the link tail
        triples = spark.read.parquet(f"{args.out}/triples_canonical")

    n = triples.count()
    dt = time.time() - t0
    print(json.dumps({
        "run_id": args.run_id,
        "triples": n,
        "seconds": round(dt, 2),
        "triples_per_sec": round(n / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
