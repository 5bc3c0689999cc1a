"""marc2rdf_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
digibib/marc2rdf (reference: /root/reference, studied for semantics only).

Pipeline (BASELINE.json north_star):
  web_pages (Iceberg/parquet: url, warc_ts, html, text, lang)
    -> extract_records   (vectorized Arrow UDF; byte-identical text per url)
    -> parse_marcxml     (vectorized; nested record struct)
    -> MappingCompiler   (marc2rdf JSON mapping -> columnar explode+select plan)
    -> triples DF (subj, pred, obj, obj_is_uri, lang, dtype)
    -> entity linking (minhash/Jaccard blocking) -> sameAs edges
    -> connected components -> URI canonicalization
    -> dedup + N-Triples materialize (+ per-partition lineage)
"""

__version__ = "0.1.0"
