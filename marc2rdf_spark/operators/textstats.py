"""Text-analysis operators for training-data pipelines over the
``documents`` table (doc_id, text, lang, source, n_chars): language-ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM, whole-stage codegen) — no UDFs.
Formulas are deliberately expressible in ANSI SQL so DuckDB can act as
the correctness oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"

# GPT-2-style pre-tokenizer pattern, restricted to the Java∩RE2 common
# dialect (both engines use PCRE alternation preference): contractions,
# letter runs, digit runs, symbol runs; inter-token whitespace is simply
# skipped by extract_all
BPE_TOKEN_RE = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS_SPLIT)))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex — the standard cheap estimate of LLM token cost."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def doc_tokens(docs: DataFrame) -> DataFrame:
    # counts pinned to long: every ANSI engine's count arithmetic is
    # BIGINT, so the cross-engine contract type is bigint end-to-end
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("len_chars"),
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """Quality-scoring features: alpha ratio, digit ratio, punctuation
    ratio, mean token length, uppercase ratio — the usual web-text
    quality heuristics (rounded for cross-engine float stability)."""
    text = F.col("text")
    total = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", "")).cast(
        "double"
    )
    upper = F.length(F.regexp_replace(text, "[^A-Z]", "")).cast("double")
    ntok = token_count(text).cast("double")
    safe_total = F.when(total > 0, total).otherwise(F.lit(1.0))
    return docs.select(
        "doc_id",
        F.round(alpha / safe_total, 4).alias("alpha_ratio"),
        F.round(digit / safe_total, 4).alias("digit_ratio"),
        F.round(punct / safe_total, 4).alias("punct_ratio"),
        F.round(upper / safe_total, 4).alias("upper_ratio"),
        F.round(
            F.when(ntok > 0, total / ntok).otherwise(F.lit(0.0)), 4
        ).alias("mean_token_len"),
        ntok.cast("long").alias("n_tokens"),
    )


# tiny deterministic stopword lists for n-gram-free language ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that"),
    "no": ("og", "det", "ikke", "som", "av"),
    "sv": ("och", "att", "det", "som", "inte"),
    "de": ("der", "und", "die", "das", "nicht"),
    "fr": ("le", "la", "les", "des", "est"),
}


def _marker_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of ' word ' markers (space-delimited, lowercased)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0)
    for w in words:
        token = f" {w} "
        occurrences = (
            F.length(padded) - F.length(F.regexp_replace(padded, token, ""))
        ) / len(token)
        total = total + occurrences.cast("long")
    return total


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax of stopword-marker hit counts;
    'und' when nothing matches.  Ties break by language code order
    (deterministic, same rule in the SQL oracle)."""
    hits = [
        _marker_hits(F.col("text"), ws).alias(f"hits_{code}")
        for code, ws in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", *hits)
    codes = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{c}") for c in codes])
    pred = F.lit("und")
    for c in reversed(codes):  # earlier codes win ties
        pred = F.when((best > 0) & (F.col(f"hits_{c}") == best), F.lit(c)).otherwise(
            pred
        )
    return scored.select(
        "doc_id", *[f"hits_{c}" for c in codes], pred.alias("lang_pred")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (stable content hash for exact-dup detection across formatting)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), WS_SPLIT, " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def text_features(docs: DataFrame) -> DataFrame:
    """All per-document text statistics in ONE narrow projection: the
    union of ``doc_tokens`` + ``quality_features`` + ``lang_id`` +
    ``fingerprint`` column sets.  Production pipelines call the
    individual operators (each already a zero-shuffle projection); this
    composition exists so one contract row value-verifies all four
    operator families side-by-side — same plan shape (one scan, one
    projection, no exchange), just a wider select list.

    Returns (doc_id, n_tokens, n_tokens_bpe, len_chars, alpha_ratio,
    digit_ratio, punct_ratio, upper_ratio, mean_token_len, hits_<code>
    per language, lang_pred, fp, norm_len)."""
    text = F.col("text")
    total = F.length(text).cast("double")
    safe_total = F.when(total > 0, total).otherwise(F.lit(1.0))
    ntok = token_count(text).cast("double")
    norm = F.regexp_replace(F.lower(F.trim(text)), WS_SPLIT, " ")
    codes = list(LANG_MARKERS)
    hit_cols = [
        _marker_hits(text, ws).alias(f"hits_{code}")
        for code, ws in LANG_MARKERS.items()
    ]
    best = F.greatest(
        *[_marker_hits(text, LANG_MARKERS[c]) for c in codes]
    )
    pred = F.lit("und")
    for c in reversed(codes):  # earlier codes win ties
        pred = F.when(
            (best > 0) & (_marker_hits(text, LANG_MARKERS[c]) == best),
            F.lit(c),
        ).otherwise(pred)
    return docs.select(
        "doc_id",
        token_count(text).cast("long").alias("n_tokens"),
        bpe_token_count(text).cast("long").alias("n_tokens_bpe"),
        F.length(text).cast("long").alias("len_chars"),
        F.round(
            F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
            / safe_total,
            4,
        ).alias("alpha_ratio"),
        F.round(
            F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
            / safe_total,
            4,
        ).alias("digit_ratio"),
        F.round(
            F.length(
                F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", "")
            ).cast("double")
            / safe_total,
            4,
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace(text, "[^A-Z]", "")).cast("double")
            / safe_total,
            4,
        ).alias("upper_ratio"),
        F.round(
            F.when(ntok > 0, total / ntok).otherwise(F.lit(0.0)), 4
        ).alias("mean_token_len"),
        *hit_cols,
        pred.alias("lang_pred"),
        F.md5(norm).alias("fp"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03): rolling char k-gram hashes, minimum per sliding window
    of w, distinct — the local-fingerprint scheme used for plagiarism /
    near-dup detection over partial overlaps.  Pure Column expressions;
    the k-gram hash is md5-derived (60-bit) so the SQL oracle can
    replicate values exactly.  Returns (doc_id, fp) exploded rows."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), WS_SPLIT, " ")
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))
    )
    grams = F.transform(idx, lambda i: F.substring(norm, i, k))
    # per-gram rows: the k-gram hash runs ONCE per gram in codegen.
    # (Computing the hash array as a nested expression would re-inline
    # it into every window lambda below — Catalyst has no CSE across
    # higher-order-function lambdas, turning winnowing quadratic.)
    g = docs.select("doc_id", F.posexplode(grams).alias("pos", "g"))
    h = g.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    arr = h.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "h"))),
            lambda s: s["h"],
        ).alias("hh")
    )
    hh = F.col("hh")
    widx = F.sequence(F.lit(1), F.greatest(F.size(hh) - (w - 1), F.lit(1)))
    mins = F.transform(widx, lambda j: F.array_min(F.slice(hh, j, w)))
    return arr.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fp")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 512,
    n_buckets: int = 32,
) -> DataFrame:
    """Sequence packing for pre-training batch assembly: assign every
    document a (bucket, bin) such that each bin holds a contiguous
    token range of at most ``budget_tokens`` (documents longer than the
    budget span multiple bins and continue mid-document — the standard
    concat-and-chunk packing used when truncation at bin boundaries is
    acceptable).  Returns (doc_id, bucket, start_tok, n_tokens, bin).

    Scale design: packing is per-BUCKET (hash of doc_id), never global
    — a single global ordering would funnel 100 TB through one window
    partition.  Within a bucket the running token offset is one
    window cumsum (partitionBy(bucket), so every bucket packs in
    parallel) and bin = floor(start/budget).  Bucket count scales with
    the corpus; bins are deterministic for a fixed (corpus, buckets,
    budget)."""
    from pyspark.sql.window import Window

    # md5-derived bucket (60-bit prefix), not xxhash64: same idiom as
    # winnow_fingerprints, chosen so the SQL oracle can replicate the
    # bucket assignment value-for-value
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    )
    toks = docs.select(
        "doc_id",
        # long, not int: the md5-prefix arithmetic is BIGINT in every
        # ANSI engine, so the pinned output type is bigint end-to-end
        bucket.cast("long").alias("bucket"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = toks.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return out.select(
        "doc_id", "bucket", "start_tok", "n_tokens",
        F.floor(F.col("start_tok") / budget_tokens).alias("bin"),
    )


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 80,
    min_alpha: float = 0.8,
    max_digit: float = 0.2,
    langs: tuple[str, ...] = ("en", "de", "fr"),
) -> DataFrame:
    """C4-style corpus cleanup composed into ONE narrow pass plus ONE
    shuffle: token-count bounds, alpha/digit quality gates and the
    language-ID allowlist are pure Column predicates computed in a
    single projection over the scan (no joins between the feature
    operators — their expressions are inlined here so the composition
    never shuffles per-feature), then the exact-dedup keeper rule
    (first doc_id per content fingerprint) is the only wide operation,
    and it runs on the gated survivors only.

    At 100 TB this is the canonical pre-training cleanup job shape:
    filters prune early (and push into the scan), the dedup shuffle
    moves only what survived.

    The keeper is a ``min_by`` groupBy, NOT a row_number window: same
    shuffle count, but (a) no sort inside hot fingerprint groups on a
    boilerplate-heavy corpus, and (b) no WindowGroupLimit sort stage —
    measured here, that sort's generated ``sort_addToSorter_0()``
    inlined this function's entire gate projection and grew beyond
    janino's 64 KB method limit, silently de-optimizing the whole
    stage to interpreted evaluation (the unattributed codegen fallback
    in BENCH_r03; reproduced as a hard error with
    SPARK_CODEGEN_FALLBACK=false)."""
    text = F.col("text")
    total = F.length(text).cast("double")
    safe_total = F.when(total > 0, total).otherwise(F.lit(1.0))
    alpha_ratio = F.round(
        F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
        / safe_total,
        4,
    )
    digit_ratio = F.round(
        F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
        / safe_total,
        4,
    )
    codes = list(LANG_MARKERS)
    norm = F.regexp_replace(F.lower(F.trim(text)), WS_SPLIT, " ")

    # Lang argmax with a SINGLE reference per marker-hit tree: greatest
    # over (hits, priority, code) structs — struct comparison is
    # lexicographic, so max hits wins, higher priority (the EARLIER
    # code in LANG_MARKERS order) breaks ties, and the (0, top, 'und')
    # sentinel wins only when every count is zero.  Same values as
    # lang_id()'s when-chain, but ONE field access means each hit
    # expression appears exactly once even where Catalyst substitutes
    # aliases (the when-chain form references every hit ~6x, and
    # pushdown-substituted into a Filter condition that duplication is
    # what grew past janino's 64 KB method limit).
    n_codes = len(codes)
    pred = F.greatest(
        *[
            F.struct(
                _marker_hits(text, LANG_MARKERS[c]).alias("h"),
                F.lit(n_codes - i).alias("pri"),
                F.lit(c).alias("code"),
            )
            for i, c in enumerate(codes)
        ],
        F.struct(
            F.lit(0).cast("long").alias("h"),
            F.lit(n_codes + 1).alias("pri"),
            F.lit("und").alias("code"),
        ),
    ).getField("code")

    raw = docs.select(
        "doc_id",
        token_count(text).cast("long").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        pred.alias("lang_pred"),
        F.md5(norm).alias("fp"),
    )
    # Catalyst substitutes this predicate through the projection down
    # to the scan — which is the RIGHT plan (rows failing the gates
    # never pay the md5/fp), and with the single-reference argmax the
    # substituted Filter condition stays under janino's method limit
    # (FilterExec cannot split its generated condition; the old
    # when-chain form overflowed it).  Verified compile-clean with
    # SPARK_CODEGEN_FALLBACK=false.
    gated = raw.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("alpha_ratio") >= min_alpha)
        & (F.col("digit_ratio") <= max_digit)
        & F.col("lang_pred").isin(*langs)
    )
    keep = gated.groupBy("fp").agg(
        F.min_by(
            F.struct(
                "doc_id", "n_tokens", "alpha_ratio", "digit_ratio", "lang_pred"
            ),
            F.col("doc_id"),
        ).alias("k")
    )
    return keep.select(
        "k.doc_id", "k.n_tokens", "k.alpha_ratio", "k.digit_ratio", "k.lang_pred"
    )
