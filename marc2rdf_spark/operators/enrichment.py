"""Enrichment harvesting (SURVEY.md §2.1 S8 + §2.6 J4,
/root/reference/lib/batch_harvest.rb).

The reference pulls solution batches from the store (a BGP with MINUS
patterns + LIMIT/OFFSET windows, batch_harvest.rb:110-131), fetches
``prefix + object + suffix`` URLs per solution, extracts values by
XPath, regex-strips them, drops known dummy cover images by MD5
checksum (batch_harvest.rb:156-175, magic md5
``0a993cc6694e9249965e626eb4e037c7``), and asserts the results onto the
``work`` or ``edition`` subject (batch_harvest.rb:90-97).

Spark-first equivalent (SURVEY.md S8: the offline pipeline joins
against a PRE-FETCHED enrichment DataFrame instead of doing network I/O
inside tasks): the BGP becomes triple self-joins, the per-solution HTTP
loop becomes one broadcast-or-shuffle equi-join keyed on the solution
object (ISBN), and the dummy-cover filter becomes a predicate on the
response's payload MD5 column.  LIMIT/OFFSET batch windows are
reproduced deterministically for parity tests; at 10^12 scale batching
is partitioning, not windowing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..vocab import RDF_TYPE

BIBO_DOCUMENT = "http://purl.org/ontology/bibo/Document"
BIBO_ISBN = "http://purl.org/ontology/bibo/isbn"
FABIO_HAS_MANIFESTATION = "http://purl.org/spar/fabio/hasManifestation"
FOAF_DEPICTION = "http://xmlns.com/foaf/0.1/depiction"

# batch_harvest.rb:166 — checksum of the known dummy cover image
DUMMY_COVER_MD5 = "0a993cc6694e9249965e626eb4e037c7"


def solutions_query(
    triples: DataFrame,
    rdf_type: str = BIBO_DOCUMENT,
    predicate: str = BIBO_ISBN,
    manifestation_pred: str | None = FABIO_HAS_MANIFESTATION,
    minuses: tuple[str, ...] = (),
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """rdfstore_query (batch_harvest.rb:110-131): SELECT ?work ?edition
    ?object WHERE { ?edition a <type> . ?edition <predicate> ?object .
    ?work <hasManifestation> ?edition } MINUS {?edition <m> ?o} ...
    LIMIT/OFFSET.

    Plan: two filters over one triples scan equi-joined on the edition
    subject (Catalyst pushes both pred filters into the scan), MINUS ->
    left_anti, the work hop -> a third join (broadcast under AQE when
    the edge set is small, cf. SURVEY.md J3).  When
    ``manifestation_pred`` is None the work variable aliases the
    edition (store has no manifestation edges).  LIMIT windows sort on
    (work, edition, object) first — the reference's store order is
    nondeterministic, ours is pinned."""
    typed = (
        triples.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == rdf_type)
        )
        .select(F.col("subj").alias("edition"))
        .distinct()
    )
    objs = triples.filter(F.col("pred") == predicate).select(
        F.col("subj").alias("edition"), F.col("obj").alias("object")
    )
    sol = typed.join(objs, "edition")
    # DOCUMENTED DEVIATION (ADVICE r1): SPARQL MINUS compatibility
    # semantics (batch_harvest.rb:114,122) only removes a solution when
    # the MINUS pattern shares the bound ?object variable — usually a
    # no-op for harvested predicates whose objects differ from the ISBN.
    # This left_anti on edition alone implements the INTENDED
    # already-harvested filter (skip editions that already carry the
    # harvested predicate), which is stricter than literal MINUS.
    for m in minuses:
        has_m = triples.filter(F.col("pred") == m).select(
            F.col("subj").alias("edition")
        )
        sol = sol.join(has_m, "edition", "left_anti")
    if manifestation_pred is not None:
        works = triples.filter(F.col("pred") == manifestation_pred).select(
            F.col("subj").alias("work"), F.col("obj").alias("edition")
        )
        sol = sol.join(works, "edition")
    else:
        sol = sol.withColumn("work", F.col("edition"))
    sol = sol.select("work", "edition", "object")
    if limit is not None:
        sol = (
            sol.orderBy("work", "edition", "object")
            .offset(offset)
            .limit(limit)
        )
    return sol


def harvest_url(object_col, prefix: str, suffix: str):
    """url = prefix + solution.object + suffix (batch_harvest.rb:80)."""
    return F.concat(F.lit(prefix), object_col, F.lit(suffix))


def synth_enrichment_responses(
    solutions: DataFrame,
    prefix: str = "http://media.example/covers?isbn=",
    suffix: str = "",
) -> DataFrame:
    """Deterministic stand-in for the fetch+XPath stage (the HTTP client
    and Nokogiri XPath of batch_harvest.rb:72-103 are NETWORK I/O that
    an offline pipeline pre-stages; SURVEY.md S8).  One row per distinct
    solution object: the request url, the XPath-extracted value (a
    cover-image URL derived from the normalized ISBN), and the fetched
    payload's MD5 — set to the known dummy-cover checksum for a
    deterministic 1/16 of keys (md5 prefix '0') so the dummy filter has
    work to do."""
    norm = F.regexp_replace(F.col("object"), "[^0-9Xx]", "")
    value = F.concat(F.lit("http://media.example/cover/"), norm, F.lit(".jpg"))
    payload_md5 = F.when(
        F.substring(F.md5(norm), 1, 1) == "0", F.lit(DUMMY_COVER_MD5)
    ).otherwise(F.md5(norm))
    return (
        solutions.select("object")
        .distinct()
        .select(
            F.col("object").alias("key"),
            harvest_url(F.col("object"), prefix, suffix).alias("url"),
            value.alias("value"),
            payload_md5.alias("payload_md5"),
        )
    )


def harvest_join(
    solutions: DataFrame,
    responses: DataFrame,
    predicate: str = FOAF_DEPICTION,
    subject: str = "work",
    datatype: str = "uri",
    regex_strip: str | None = None,
    filter_dummy: bool = True,
) -> DataFrame:
    """run_harvester re-expressed as a join (batch_harvest.rb:74-103):
    solutions x responses on the object key -> (subject, predicate,
    value) triples.  ``subject`` picks 'work' or 'edition'
    (batch_harvest.rb:91-96); regex_strip mirrors the per-predicate
    option (batch_harvest.rb:148); dummy covers dropped by payload MD5
    (batch_harvest.rb:156-175).  The response table is small relative
    to the solution stream — Catalyst/AQE broadcasts it."""
    resp = responses
    if filter_dummy:
        resp = resp.filter(F.col("payload_md5") != DUMMY_COVER_MD5)
    val = F.col("value")
    if regex_strip is not None:
        val = F.regexp_replace(val, regex_strip, "")
    joined = solutions.join(
        resp, solutions["object"] == resp["key"]
    )
    is_uri_dt = datatype == "uri"
    return joined.select(
        F.col(subject).alias("subj"),
        F.lit(predicate).alias("pred"),
        val.alias("obj"),
        F.lit(is_uri_dt).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dtype"),
    ).dropDuplicates(["subj", "pred", "obj"])


def count_resource(triples: DataFrame, rdf_type: str) -> DataFrame:
    """count_resource (batch_harvest.rb:32-39): COUNT DISTINCT subjects
    of a type (SURVEY.md A1)."""
    return (
        triples.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == rdf_type)
        )
        .agg(F.countDistinct("subj").alias("n"))
    )


def batched(solutions: DataFrame, batch_limit: int) -> DataFrame:
    """start_harvest's offset/limit windows (batch_harvest.rb:53-67) as
    a deterministic batch-id column — at scale a partition IS the
    batch; this keeps the reference's batch accounting testable."""
    from pyspark.sql.window import Window

    w = Window.orderBy("work", "edition", "object")
    return solutions.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / batch_limit).cast("int"),
    )
