"""Unit tests for store ops (U1-U5), dedup family, similarity search,
connected components, linking, and multimodal plumbing — small synthetic
inputs with hand-computable expectations."""

import pytest
from pyspark.sql import functions as F

from marc2rdf_spark.vocab import RDF_TYPE

TCOLS = ["subj", "pred", "obj", "obj_is_uri", "lang", "dtype"]


TSCHEMA = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "lang string, dtype string"
)


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, True, None, None) for s, p, o in rows], TSCHEMA
    )


@pytest.fixture(scope="module")
def store(spark):
    person = "http://xmlns.com/foaf/0.1/Person"
    return _triples(
        spark,
        [
            ("d1", "creator", "p1"),
            ("d1", "title", "t1"),
            ("d1", "http://www.w3.org/2002/07/owl#sameAs", "d9"),
            ("d2", "creator", "p1"),
            ("p1", RDF_TYPE, person),
            ("d2", RDF_TYPE, "Doc"),
            ("d3", "ref", "d1"),
        ],
    )


def test_select_record(store):
    from marc2rdf_spark.operators.store import select_record

    assert select_record(store, "d1").count() == 3


def test_delete_record_preserving(store):
    from marc2rdf_spark.operators.store import delete_record_preserving

    out = delete_record_preserving(store, ["d1"], ("OWL.sameAs",))
    rows = {(r.subj, r.pred) for r in out.collect()}
    assert ("d1", "creator") not in rows
    assert ("d1", "http://www.w3.org/2002/07/owl#sameAs") in rows
    assert ("d2", "creator") in rows


def test_purge_record_inbound(store):
    from marc2rdf_spark.operators.store import purge_record

    out = purge_record(store, ["d1"])
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert not any(s == "d1" for s, _, _ in rows)
    assert ("d3", "ref", "d1") not in rows  # inbound edge purged
    assert ("d2", "creator", "p1") in rows


def test_bgp_join(store):
    from marc2rdf_spark.operators.store import bgp_join

    out = bgp_join(store, "creator", "http://xmlns.com/foaf/0.1/Person")
    assert {(r.doc, r.node) for r in out.collect()} == {
        ("d1", "p1"),
        ("d2", "p1"),
    }


def test_upsert_records(spark, store):
    from marc2rdf_spark.operators.store import upsert_records

    fresh = spark.createDataFrame(
        [("d1", "title", "t1-new", False, None, None)], TSCHEMA
    )
    out = upsert_records(store, fresh, ("OWL.sameAs",))
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("d1", "title", "t1-new") in rows
    assert ("d1", "title", "t1") not in rows
    assert ("d1", "http://www.w3.org/2002/07/owl#sameAs", "d9") in rows


def test_delete_ops_never_shuffle_the_store(spark, store):
    """Plan regression (VERDICT r1 #2): U1/U2 must be broadcast-join +
    filter — the store side must never hash-repartition.  The old
    exceptAll formulation shuffled BOTH sides on all six triple columns."""
    from marc2rdf_spark.operators.store import (
        delete_old_authorities,
        delete_record_preserving,
        upsert_records,
    )

    plan = delete_record_preserving(
        store, ["d1"], ("OWL.sameAs",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan

    plan = delete_old_authorities(
        store, store
    )._jdf.queryExecution().executedPlan().toString()
    # the only allowed shuffle is the tiny auth-side distinct (on subj);
    # a store-wide shuffle would partition on the full triple row
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "pred" not in line, line

    fresh = spark.createDataFrame(
        [("d1", "title", "t", False, None, None)], TSCHEMA
    )
    plan = upsert_records(
        store, fresh, ("OWL.sameAs",)
    )._jdf.queryExecution().executedPlan().toString()
    # upsert keeps exactly ONE store-wide shuffle: the A4 dedup-on-insert
    n_wide = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "pred" in line
    )
    assert n_wide <= 1, plan


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("fast", "quickly")),  # near dup
        (4, "og det var en helt annen tekst som ikke ligner på noe annet"),
        (5, "completely different content about apples and oranges here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(docs):
    from marc2rdf_spark.operators.dedup import exact_duplicates

    out = exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0].keep_id == 1 and out[0].n_docs == 2


def test_minhash_near_duplicates(docs):
    from marc2rdf_spark.operators.dedup import near_duplicates

    pairs = {(r.a, r.b) for r in near_duplicates(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs  # identical
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup
    assert not any(4 in p or 5 in p for p in pairs)


def test_simhash_near_dups(docs):
    from marc2rdf_spark.operators.dedup import simhash_near_dups

    pairs = {(r.a, r.b): r.hamming for r in simhash_near_dups(docs, 10).collect()}
    assert pairs[(1, 2)] == 0


def test_ngram_jaccard_identical(spark, docs):
    from marc2rdf_spark.operators.dedup import ngram_jaccard

    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = ngram_jaccard(docs, pairs).collect()
    assert out[0].jaccard == 1.0


# ---------------------------------------------------------------------------


def test_brute_force_topk(spark):
    from marc2rdf_spark.operators.similarity import brute_force_topk

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.05]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=2)
    got = [(r.n_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(3, 1), (1, 2)]


def test_lsh_topk_recovers_nearest(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(50)
    ]
    # plant a near-identical pair
    rows.append((100, [x + 0.01 for x in rows[0][1]]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from marc2rdf_spark.operators.similarity import lsh_topk

    out = lsh_topk(emb, emb.filter(F.col("vec_id") == 0), k=3, dim=16)
    top = [r.n_id for r in out.orderBy("rank").collect()]
    assert top and top[0] == 100


def test_lsh_bucket_vectorized_parity(spark):
    """The pandas-UDF matmul bucketing (production-dim path, VERDICT r2
    #4) must assign exactly the same (id, table, bucket) rows as the
    unrolled Column-expression form."""
    import random

    from marc2rdf_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket_table,
    )

    dim, n_planes, n_tables = 256, 6, 2
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    tables = [_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]

    unrolled = {
        tuple(r)
        for r in lsh_bucket_table(
            emb, tables, "vec_id", "embedding", vectorized=False
        ).collect()
    }
    vector = {
        tuple(r)
        for r in lsh_bucket_table(
            emb, tables, "vec_id", "embedding", vectorized=True
        ).collect()
    }
    assert unrolled == vector
    assert len(unrolled) == 40 * n_tables


def test_lsh_auto_vectorizes_at_high_dim(spark):
    """dim 1024 x 8 planes x 8 tables would be ~65k literal nodes; the
    auto threshold must pick the vectorized plan and keep the analyzed
    plan O(1) in dim."""
    from marc2rdf_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket_table,
    )

    dim, n_planes, n_tables = 1024, 8, 8
    emb = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0
            ),
        ).alias("embedding"),
    )
    tables = [_hyperplanes(dim, n_planes, seed=t) for t in range(n_tables)]
    out = lsh_bucket_table(emb, tables, "vec_id", "embedding")
    assert "ArrowEvalPython" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 30 * n_tables


# ---------------------------------------------------------------------------


def test_connected_components_shapes(spark):
    from marc2rdf_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("h", "h1"), ("h", "h2"), ("h", "h3")],
        ["left_uri", "right_uri"],
    )
    comp = {r.uri: r.component for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["h1"] == comp["h2"] == comp["h3"] == comp["h"] == "h"


def test_connected_components_path_graph_log_rounds(spark):
    """A 1000-node path is the adversarial case for min-label
    propagation (diameter 999).  Large-star/small-star must converge in
    O(log n) rounds — cap at 15 and require correct labels, which fails
    if convergence needs more."""
    from marc2rdf_spark.operators.components import connected_components

    n = 1000
    edges = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(n - 1)],
        ["left_uri", "right_uri"],
    ).repartition(8)
    comp = {
        r.uri: r.component
        for r in connected_components(edges, max_iterations=15).collect()
    }
    assert len(comp) == n
    assert set(comp.values()) == {"n0000"}


def test_connected_components_self_loop_only_node(spark):
    from marc2rdf_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [("s", "s"), ("a", "b")], ["left_uri", "right_uri"]
    )
    comp = {r.uri: r.component for r in connected_components(edges).collect()}
    assert comp == {"s": "s", "a": "a", "b": "a"}


def test_canonicalize_rewrites_subj_and_uri_obj(spark):
    from marc2rdf_spark.operators.components import (
        canonicalize_triples,
        connected_components,
    )

    edges = spark.createDataFrame([("b", "a")], ["left_uri", "right_uri"])
    comps = connected_components(edges)
    triples = spark.createDataFrame(
        [
            ("b", "p", "b", True, None, None),
            ("c", "p", "b", False, None, None),  # literal obj untouched
        ],
        TSCHEMA,
    )
    out = {(r.subj, r.obj) for r in canonicalize_triples(triples, comps).collect()}
    assert ("a", "a") in out
    assert ("c", "b") in out


def test_linking_matches_exact_and_noisy(spark):
    from marc2rdf_spark.operators.linking import link_mentions

    mentions = spark.createDataFrame(
        [
            ("m1", "Petterson, Per"),
            ("m2", "Pettersön, Pér"),
            ("m3", "Totally Unrelated Name"),
        ],
        ["mention_uri", "label"],
    )
    auth = spark.createDataFrame(
        [("a1", "Petterson, Per"), ("a2", "Hamsun, Knut")],
        ["auth_id", "label"],
    )
    links = {r.mention_uri: r.auth_id for r in
             link_mentions(mentions, auth, threshold=0.5).collect()}
    assert links.get("m1") == "a1"
    assert links.get("m2") == "a1"
    assert "m3" not in links


def test_blocking_recall_is_total(spark):
    """Pins the kg_link_entities / kg_full_pipeline oracle assumption:
    on the golden fixture, the MinHash-blocked linking join finds the
    same best matches as exhaustive all-pairs scoring (blocking recall
    1.0 for this data).  If a fixture change breaks this, the DuckDB
    oracles must switch back to rows-only."""
    import os

    from marc2rdf_spark.operators.linking import (
        link_mentions,
        mention_nodes,
        trigram_jaccard_udf,
    )

    golden = os.path.join(
        os.path.dirname(__file__), "..", "fixtures", "golden"
    )
    triples = spark.read.parquet(
        os.path.join(golden, "triples_skeleton.parquet")
    )
    authorities = spark.read.parquet(os.path.join(golden, "authorities.parquet"))
    label_pred = "http://def.bibsys.no/xmlns/radatana/1.0#catalogueName"
    mentions = mention_nodes(triples, [label_pred])

    blocked = {
        (r.mention_uri, r.auth_id, r.score)
        for r in link_mentions(mentions, authorities, threshold=0.7).collect()
    }

    allpairs = (
        mentions.select("mention_uri", F.col("label").alias("m_label"))
        .crossJoin(
            authorities.select("auth_id", F.col("label").alias("a_label"))
        )
        .withColumn(
            "score", trigram_jaccard_udf(F.col("m_label"), F.col("a_label"))
        )
        .filter(F.col("score") >= 0.7)
        .groupBy("mention_uri")
        .agg(
            F.max_by(
                F.struct(F.col("auth_id"), F.round("score", 4).alias("score")),
                F.struct(F.col("score"), F.col("auth_id")),
            ).alias("best")
        )
        .select(
            "mention_uri",
            F.col("best.auth_id").alias("auth_id"),
            F.col("best.score").alias("score"),
        )
    )
    exact = {(r.mention_uri, r.auth_id, r.score) for r in allpairs.collect()}
    assert blocked == exact and blocked


def test_ann_lsh_matches_numpy_replication(spark):
    """Pins the ann_lsh_topk contract honestly: the Spark LSH output
    must equal an independent numpy replication of the same algorithm
    (same fixed-seed planes, sign-of-dot signatures, (table, bucket)
    candidate join, exact cosine re-rank) — AND the bucketing must be
    genuinely non-degenerate with a real candidate reduction vs the
    cross join.  (The old form asserted LSH == brute force, which only
    held because dim-16 planes on dim-64 vectors NULL-padded every dot
    and collapsed all signatures into a single bucket.)"""
    import os

    import numpy as np

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("driver testdata not present")
    from marc2rdf_spark.operators.similarity import _hyperplanes, lsh_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 3)
    lsh = {
        (r.q_id, r.n_id, r.rank)
        for r in lsh_topk(emb, queries, k=5, dim=64).collect()
    }

    dim, n_planes, n_tables, k = 64, 8, 4, 5
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    sigs = np.zeros((len(ids), n_tables), dtype=np.int64)
    for t in range(n_tables):
        planes = np.array(_hyperplanes(dim, n_planes, seed=42 + t))
        sigs[:, t] = (
            ((m @ planes.T) > 0) * (1 << np.arange(n_planes))
        ).sum(axis=1)

    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(len(ids)):
        for t in range(n_tables):
            buckets.setdefault((t, sigs[i, t]), []).append(i)
    assert len(buckets) > 4 * n_tables, "bucketing degenerate"

    expected = set()
    n_cand_total = 0
    qidx = [i for i in range(len(ids)) if ids[i] < 3]
    for qi in qidx:
        cand = set()
        for t in range(n_tables):
            cand.update(buckets[(t, sigs[qi, t])])
        cand.discard(qi)
        n_cand_total += len(cand)
        sims = sorted(
            (
                (
                    -(m[qi] @ m[ci])
                    / (np.linalg.norm(m[qi]) * np.linalg.norm(m[ci])),
                    ids[ci],
                )
                for ci in cand
            ),
        )
        for rank, (_, n_id) in enumerate(sims[:k], start=1):
            expected.add((int(ids[qi]), int(n_id), rank))

    assert lsh == expected
    # the scale-path claim: candidates are a small fraction of the corpus
    assert n_cand_total < 0.2 * len(ids) * len(qidx)


def test_lsh_prefix_slice_parity(spark):
    """Planes shorter than the vector project onto the prefix (explicit
    F.slice) instead of NULL-padding: both physical paths agree and the
    bucketing is non-degenerate."""
    import random

    from marc2rdf_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket_table,
    )

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(30)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    tables = [_hyperplanes(16, 6, seed=5 + t) for t in range(2)]
    unrolled = {
        tuple(r)
        for r in lsh_bucket_table(
            emb, tables, "vec_id", "embedding", vectorized=False
        ).collect()
    }
    vector = {
        tuple(r)
        for r in lsh_bucket_table(
            emb, tables, "vec_id", "embedding", vectorized=True
        ).collect()
    }
    assert unrolled == vector
    assert len({(t, b) for _, t, b in unrolled}) > 4


def test_minhash_md5_mode_equivalent_shape(docs):
    """md5 hash mode returns the same near-dup pairs as xxhash64 mode on
    the toy corpus (both find the (1,2) exact pair and (1,3)/(2,3))."""
    from marc2rdf_spark.operators.dedup import near_duplicates

    fast = {
        (r.a, r.b) for r in near_duplicates(docs, threshold=0.5).collect()
    }
    sql_mode = {
        (r.a, r.b)
        for r in near_duplicates(docs, threshold=0.5, hash_fn="md5").collect()
    }
    assert (1, 2) in fast and (1, 2) in sql_mode
    assert fast == sql_mode


def test_multimodal_feature_plumbing(spark):
    from marc2rdf_spark.operators.multimodal import (
        FEATURE_DIM,
        deterministic_fake_decode,
        extract_features,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"payload-1"), {"k": "v"})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = extract_features(media).collect()
    assert len(out) == 1
    assert len(out[0].feature) == FEATURE_DIM
    expected = deterministic_fake_decode(b"payload-1")
    assert [round(x, 5) for x in out[0].feature] == [
        round(x, 5) for x in expected
    ]


def test_real_decode_is_stubbed():
    from marc2rdf_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"x")


def test_multi_key_subfield_conditions_chain(spark):
    """Multi-key subfield conditions fold in key order with the
    reference's keep-previous-unless-empty chain (rdfmodeler.rb:205-216,
    VERDICT r2 missing #3): later match overwrites, later EMPTY sibling
    resets to that key's default, later no-match keeps the earlier
    result unless empty.  Both Spark compilers must agree with the
    independent oracle on every chain branch."""
    from marc2rdf_spark.compiler import MappingCompiler
    from marc2rdf_spark.compiler.unrolled import UnrolledMappingCompiler
    from marc2rdf_spark.config import Library, Mapping
    from marc2rdf_spark.marc import (
        ControlField,
        DataField,
        Record,
        Subfield,
        record_to_dict,
        record_to_xml,
    )
    from marc2rdf_spark.oracle.converter import convert_records
    from marc2rdf_spark.schema import RECORDS_SCHEMA

    # key order e then f; f has NO default (Ruby nil -> triple skipped)
    mapping = Mapping(
        tags={
            "700": {
                "subfield": {
                    "3": {
                        "object": {
                            "datatype": "uri",
                            "prefix": "http://example.com/person/",
                        },
                        "conditions": {
                            "subfield": {
                                "e": {
                                    "default": "DC.contributor",
                                    "subs": {"overs": "BIBO.translator"},
                                    "orig": "overs",
                                },
                                "f": {
                                    "subs": {"red": "BIBO.editor"},
                                    "orig": "red",
                                },
                            }
                        },
                    }
                }
            }
        }
    )

    def rec(rec_id: str, sfs: list[tuple[str, str]]) -> Record:
        f = DataField("700", " ", " ")
        f.subfields.append(Subfield("3", rec_id))
        for code, val in sfs:
            f.subfields.append(Subfield(code, val))
        return Record(leader="", fields=[ControlField("001", rec_id), f])

    records = [
        # e matches, f MISSING -> f's nil default overwrites -> skipped
        rec("r1", [("e", "overs.")]),
        # e matches, f present no-match -> keeps translator
        rec("r2", [("e", "overs."), ("f", "xxx")]),
        # e matches, f matches -> editor overwrites
        rec("r3", [("e", "overs."), ("f", "red.")]),
        # e no-match -> contributor default; f no-match keeps it
        rec("r4", [("e", "zzz"), ("f", "xxx")]),
        # e missing -> contributor default; f matches -> editor
        rec("r5", [("f", "red")]),
    ]
    oracle = {
        (t.subj, t.pred) for t in convert_records(records, mapping, Library())
    }
    # r1: f's missing default nils the predicate -> only the rdf:type
    # triple survives for that record
    r1_preds = {p for s, p in oracle if s.endswith("r1") and "type" not in p}
    assert r1_preds == set()
    assert sorted(p for _s, p in oracle if "type" not in p) == sorted(
        [
            "http://purl.org/ontology/bibo/translator",  # r2
            "http://purl.org/ontology/bibo/editor",  # r3
            "http://purl.org/dc/terms/contributor",  # r4
            "http://purl.org/ontology/bibo/editor",  # r5
        ]
    )

    rows = [
        {
            "url": f"u{i}",
            "record_xml": record_to_xml(r),
            "record": record_to_dict(r),
        }
        for i, r in enumerate(records)
    ]
    records_df = spark.createDataFrame(rows, RECORDS_SCHEMA)
    for compiler_cls in (MappingCompiler, UnrolledMappingCompiler):
        triples = compiler_cls(mapping, Library()).convert(records_df)
        got = {
            (t.subj, t.pred)
            for t in triples.select("subj", "pred").collect()
        }
        assert got == oracle, compiler_cls.__name__


def test_bpe_token_count(spark):
    from marc2rdf_spark.operators.textstats import doc_tokens

    docs = spark.createDataFrame(
        [(1, "it's 42 degrees, really!"), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: (r.n_tokens, r.n_tokens_bpe) for r in doc_tokens(docs).collect()}
    # it | 's | ' 42' | ' degrees' | ',' | ' really' | '!'  -> 7
    assert rows[1] == (4, 7)
    assert rows[2] == (0, 0)
    assert rows[3] == (0, 0)


def test_winnow_fingerprints_shared_substring(spark):
    """Winnowing guarantee: documents sharing a long substring share
    fingerprints; disjoint documents (different alphabets) share none."""
    from marc2rdf_spark.operators.textstats import winnow_fingerprints

    common = "the winnowing algorithm selects minimum hashes per window"
    docs = spark.createDataFrame(
        [
            (1, "prefix one " + common),
            (2, common + " suffix two"),
            (3, "0123456789 9876543210 1029384756"),
        ],
        ["doc_id", "text"],
    )
    fps = {}
    for r in winnow_fingerprints(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2]          # overlap detected
    assert not (fps[1] & fps[3])    # disjoint content


def test_ivf_assign_vectorized_parity(spark):
    """The zero-shuffle matmul cell assignment (100 TB path) must pick
    exactly the same (id, cell) rows as the declarative broadcast-
    crossJoin + row_number form, including the (sim DESC, cell ASC)
    tie-break."""
    import random

    from marc2rdf_spark.operators.similarity import ivf_assign_cells

    rng = random.Random(13)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    centroids = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], ["cell", "c_vec"]
    )
    decl = {
        tuple(r)
        for r in ivf_assign_cells(
            emb, centroids, 3, "vec_id", "embedding", vectorized=False
        ).collect()
    }
    vect = {
        tuple(r)
        for r in ivf_assign_cells(
            emb, centroids, 3, "vec_id", "embedding", vectorized=True
        ).collect()
    }
    assert decl == vect
    assert len(decl) == 60 * 3


def test_ivf_topk_planted_neighbor(spark):
    """A vector nearly identical to a query lands in the same cell, so
    IVF recovers it at rank 1; candidate volume is bounded by
    ~nprobe/n_cells of the corpus (the scale claim)."""
    import random

    from marc2rdf_spark.operators.similarity import ivf_topk

    rng = random.Random(17)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(80)]
    rows.append((200, [x + 0.01 for x in rows[20][1]]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") == 20), k=3, n_cells=8, nprobe=2
    )
    got = [r.n_id for r in out.orderBy("rank").collect()]
    assert got and got[0] == 200


def test_clean_corpus_composition(spark):
    """Gates + language allowlist + exact-dedup keeper in one pass:
    short docs, digit-heavy docs, disallowed languages and non-keeper
    duplicates all drop; the keeper survives once."""
    from marc2rdf_spark.operators.textstats import clean_corpus

    good = " ".join(["the quick brown fox and the lazy dog run"] * 3)
    rows = [
        (1, good),
        (2, good),  # exact dup of 1 -> dropped, 1 kept
        (3, "short text"),  # too few tokens
        (4, " ".join(["og det var ikke som av en bok"] * 4)),  # lang 'no'
        (5, " ".join(["12345 67890 13579"] * 10)),  # digit-heavy
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = clean_corpus(
        docs, min_tokens=10, max_tokens=100, min_alpha=0.5,
        max_digit=0.2, langs=("en", "de", "fr"),
    )
    got = {r.doc_id: r.lang_pred for r in out.collect()}
    assert got == {1: "en"}


def test_lsh_bucket_plane_dim_exceeds_vector_dim_raises(spark):
    """ADVICE r3: the unrolled path must fail loudly (like the
    vectorized path's ValueError) when planes are LONGER than the
    vectors — NULL-padded dots would otherwise collapse every
    signature to bucket 0, silently degrading LSH to brute force."""
    import pytest as _pytest

    from marc2rdf_spark.operators.similarity import lsh_topk

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    with _pytest.raises(Exception, match="vector dim|ASSERT"):
        lsh_topk(emb, q, k=2, dim=16, vectorized=False).collect()


def test_connected_components_stats_and_long_ids(spark):
    """The long-id rounds must report their mode + per-round frontier
    sizes (the exchange-bytes evidence), and still label by
    lexicographic min URI."""
    from marc2rdf_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")],
        "left_uri string, right_uri string",
    )
    st: dict = {}
    comps = connected_components(edges, stats=st)
    labels = {r.uri: r.component for r in comps.collect()}
    assert labels == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}
    assert st["node_ids"] == "xxhash64"
    assert st["converged"] and len(st["round_rows"]) == st["rounds"]


def test_connected_components_empty_and_self_loop(spark):
    from marc2rdf_spark.operators.components import connected_components

    empty = spark.createDataFrame(
        [], "left_uri string, right_uri string"
    )
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame(
        [("a", "a")], "left_uri string, right_uri string"
    )
    rows = connected_components(loops).collect()
    assert [(r.uri, r.component) for r in rows] == [("a", "a")]


def test_decontaminate_flags_overlap(spark):
    """A training doc that is a benchmark doc verbatim must score 1.0
    and be flagged; a disjoint doc scores 0.0."""
    from marc2rdf_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in this sentence here"),
            (3, "the quick brown fox jumps over something else entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench).collect()}
    assert out[1].contamination == 1.0 and out[1].flagged
    assert out[2].contamination == 0.0 and not out[2].flagged
    # doc 3 shares the leading 3-grams but not the tail
    assert 0.0 < out[3].contamination < 1.0


def test_pack_sequences_budget_and_continuity(spark):
    """Within every bucket, token offsets are contiguous (no gaps/
    overlaps in doc_id order) and bin boundaries land at multiples of
    the budget."""
    from marc2rdf_spark.operators.textstats import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, budget_tokens=10, n_buckets=4).collect()
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(rows) == 40 and len(by_bucket) > 1
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.start_tok == off, "offsets must be contiguous"
            assert r.bin == r.start_tok // 10
            off += r.n_tokens


def test_lsh_cap_metrics_counts_dropped_rows(spark):
    """With identical documents every band bucket holds all docs, so a
    cap of 2 must report (n_docs - 2) dropped rows per band."""
    from marc2rdf_spark.operators.dedup import lsh_cap_metrics

    docs = spark.createDataFrame(
        [(i, "same exact text for every document here") for i in range(5)],
        "doc_id long, text string",
    )
    m = lsh_cap_metrics(docs, num_hashes=8, bands=4, max_bucket=2)
    assert m["banded_rows"] == 5 * 4
    assert m["capped_rows"] == (5 - 2) * 4
