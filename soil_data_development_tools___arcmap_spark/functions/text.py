"""Text-analysis operators for the large-scale training-data pipeline:
token counting, quality scoring, language-ID heuristic, document
fingerprinting.

All native Column expressions (WholeStageCodegen end to end) — no
Python UDFs. Ratios are emitted floor-scaled to integers (see
queries.py determinism contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic scoring, mirrored 1:1 in the DuckDB oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "data", "order"),
    "es": ("query", "row", "table"),
    "de": ("hash", "sort", "value"),
    "fr": ("group", "line", "vector"),
    "zh": ("spark", "big", "dup"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(F.col(col), " ")


#: BPE-ish pre-tokenizer: word pieces of <=4 chars + punctuation runs —
#: a deterministic stand-in for a real BPE vocab's piece count
BPE_RE = r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"


def token_count(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword-piece count (the
    pre-training budget estimator) + char length."""
    return df.select(
        id_col,
        F.size(tokens(col)).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_RE), 0)).alias(
            "n_subtok"
        ),
        F.length(F.col(col)).alias("n_chars_calc"),
    )


def quality_features(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Quality-scoring features: token count, type-token ratio,
    mean token length, stopword ratio — the length/stopword heuristics
    a pre-training corpus filter runs. Ratios floor-scaled to 1e-4."""
    t = tokens(col)
    n = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    mean_len = (F.length(F.col(col)) - (n - 1)) / n  # chars minus spaces
    return df.select(
        id_col,
        n.alias("n_tokens"),
        F.floor((n_distinct / n) * 10000).cast("long").alias("ttr_e4"),
        F.floor((n_stop / n) * 10000).cast("long").alias("stop_e4"),
        F.floor(mean_len * 10000).cast("long").alias("mean_len_e4"),
    )


def langid_scores(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Marker-word language ID: score = marker hits per language,
    argmax wins (ties broken by language code ASC)."""
    t = tokens(col)
    scores = [
        F.size(F.filter(t, lambda x: x.isin(*marks))).alias(f"score_{lang}")
        for lang, marks in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(id_col, *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{la}") == best, F.lit(la)) for la in langs]
    )
    return scored.select(
        id_col, pred.alias("lang_pred"), best.alias("lang_score")
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Deterministic 60-bit document fingerprint (md5 prefix, hex)."""
    return df.select(
        id_col, F.substring(F.md5(F.col(col)), 1, 15).alias("fp")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Token-window chunking — the pre-tokenizer packing step of a
    training-data pipeline: overlapping windows of ``window`` tokens
    every ``stride`` tokens (overlap = window - stride), one row per
    chunk with its token count and content fingerprint.

    Pure Column expressions: sequence() generates the start offsets,
    explode fans out one row per chunk, slice() cuts the token window
    — no Python in the row path, and the fan-out multiplies rows by
    ~n_tokens/stride only AFTER the parquet scan projects the single
    text column. The token array is materialized first (transform
    lambdas re-evaluate embedded subexpressions — see dedup)."""
    toks = df.select(
        F.col(id_col), F.split(F.col(col), " ").alias("__t")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__t") - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice(F.col("__t"), F.col("__start") + 1, window)
    return (
        toks.select(id_col, "__t", F.explode(starts).alias("__start"))
        .select(
            id_col,
            (F.col("__start") / stride).cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_tok"),
            F.substring(
                F.md5(F.concat_ws(" ", chunk)), 1, 16
            ).alias("chunk_fp"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 128,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing — assign chunks to token-budget batches, the
    step between chunking and tokenization. Chunks are packed in
    (doc_id, chunk_idx) order WITHIN a shard (``doc_id % n_shards``),
    batch = running-token-total-of-PRECEDING-rows // budget: a single
    window cumulative sum per shard, fully deterministic.

    Bound (not a hard cap): the chunk straddling a budget boundary is
    assigned to the EARLIER batch, so a batch holds at most
    ``budget + max_chunk_tokens - 1`` tokens. That is the right trade
    for training batches (no chunk ever splits, no second pass); a
    hard cap would need a greedy close-when-full scan, which cannot be
    a single window expression. ``id_col`` must be NUMERIC — the shard
    key is ``id % n_shards`` (a string id would make the modulus null
    and collapse every row into one shard partition).

    Sharding is the scale design: a global packing order would be one
    total sort on one task; per-shard packing runs n_shards
    independent window partitions (the standard practice — training
    batches don't need a globally contiguous order, only bounded
    token counts and determinism)."""
    if not isinstance(
        chunks.schema[id_col].dataType,
        (LongType, IntegerType, ShortType, ByteType),
    ):
        raise TypeError(
            f"pack_chunks: {id_col} must be an integral column, got "
            f"{chunks.schema[id_col].dataType.simpleString()}"
        )
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc(), F.col("chunk_idx").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn("shard", shard)
        .withColumn(
            "batch_id",
            (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget)
            .cast("int"),
        )
        .select(id_col, "chunk_idx", "shard", "batch_id")
    )


def mix_sample(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    denom: int = 10000,
) -> DataFrame:
    """Deterministic source-stratified sampling — the data-mixing step
    of a training pipeline: ``weights`` is a (source, rate) dim where
    ``rate`` is out of ``denom``, and a document is kept iff
    ``id % denom < rate`` — every run (and every engine) selects the
    SAME rows: reproducible mixtures, no RNG state to coordinate
    across executors.

    The weights dim is broadcast: the keep decision is a map-side
    filter over the corpus scan, zero shuffles. The id modulus assumes
    roughly-uniform ids (true for sequential ingest ids); for
    clustered or hashed id spaces substitute ``pmod(xxhash64(id),
    denom)`` — same plan, engine-specific hash."""
    return (
        df.join(F.broadcast(weights), source_col)
        .where(F.pmod(F.col(id_col), F.lit(denom)) < F.col("rate"))
        .drop("rate")
    )


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1),
    thresholds adapted so every rule discriminates on the synthetic
    corpus: word-count window [20, 80], mean-word-length window
    [4.0, 5.0] chars, >=2 distinct stopwords, and a type-token-ratio
    floor 0.35 (the repetition proxy). The paper's symbol-ratio and
    alpha-word rules are vacuous on an all-alphabetic vocabulary and
    are omitted rather than shipped as always-true columns.

    Every threshold is an exact integer cross-multiplication (e.g.
    mean_len >= 3.5 as ``2*chars >= 7*n``) — no float compare, so the
    keep decision is engine-exact. Pure Column expressions, one
    map-only stage."""
    t = tokens(col)
    n = F.size(t)
    chars = F.length(F.col(col)) - (n - F.lit(1))  # chars minus spaces
    n_distinct = F.size(F.array_distinct(t))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(t), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    r_wc = (n >= 20) & (n <= 80)
    r_mwl = (chars >= n * 4) & (chars <= n * 5)
    r_stop = n_stop >= 2
    r_ttr = n_distinct * 20 >= n * 7
    return df.select(
        id_col,
        n.alias("n_tokens"),
        r_wc.cast("int").alias("r_wordcount"),
        r_mwl.cast("int").alias("r_mean_word_len"),
        r_stop.cast("int").alias("r_stopwords"),
        r_ttr.cast("int").alias("r_ttr"),
        (r_wc & r_mwl & r_stop & r_ttr).cast("int").alias("keep"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (the Gopher dup-ngram
    family): per document, the occurrence count of its MOST FREQUENT
    word 2-gram, the total/distinct 2-gram counts, and the top-gram
    fraction (e4, exact integer division). A templated or looping
    document shows a high top fraction long before exact-dup or
    MinHash catches it.

    Plan: adjacent-pair zip (two array slices, no self-join) →
    explode → count by (doc, gram) → max/sum per doc. Both shuffles
    key on (doc_id[, gram]), combine map-side, and carry counts only —
    at 100 TB the gram shuffle is bounded by tokens-per-doc, never by
    corpus-pair cardinality."""
    t = tokens(col)
    grams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g = df.select(id_col, F.explode(grams).alias("gram"))
    per = g.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.max("c").alias("top_gram_n"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "top_gram_n",
            "n_distinct_grams",
            F.expr("top_gram_n * 10000 div n_grams").alias("top_frac_e4"),
        )
    )
