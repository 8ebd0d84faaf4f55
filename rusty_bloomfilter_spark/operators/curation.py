"""Corpus-curation relational operators: per-key frequency capping and
deterministic token-budget sequence packing.

Both are pure-Catalyst (window functions + hash aggregates, zero
Python in the row path) so they inherit whole-stage codegen, AQE skew
handling, and partition-pruned scans for free. They complement the
sketch pipeline: a 100-TB curation run caps hot domains and packs the
survivors into fixed-context training windows right after dedup.

Reference parity: the reference library (``/root/reference/src/
bloomfilter/mod.rs``) has no relational surface; these extend the
§2.2 dataflow categories (window functions, aggregations) with the
two curation steps an LLM-data pipeline runs around the sketches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def frequency_cap(
    df: DataFrame,
    key: str | Column,
    cap: int,
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key``, ranked by ``order_by``.

    Adds two columns: ``cap_rank`` (1-based rank within the key) and
    ``kept`` (rank <= cap). The caller chooses whether to filter or to
    audit the drops; returning the flag keeps one plan serving both.

    ``order_by`` MUST be a total order (include a unique tiebreaker
    such as doc_id) or ``kept`` is nondeterministic across runs — the
    classic silent-resample bug in curation reruns.

    Scale: one shuffle on ``key``; a hot domain concentrates in one
    task, which AQE's skew-split cannot fix for window functions —
    for pathological keys, pre-filter with a per-key threshold from a
    sketch pass (t-digest of the order column per key) so only
    near-the-cut rows enter the window. At typical domain skew
    (<10^7 rows/domain) the single-task sort is fine.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.withColumn("cap_rank", F.row_number().over(w)).withColumn(
        "kept", F.col("cap_rank") <= F.lit(int(cap))
    )


def pack_sequences(
    seq: DataFrame,
    capacity: int,
    key: str = "source",
    order_col: Column | None = None,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Assign documents to fixed-capacity training-context bins.

    Deterministic contiguous packing: within each ``key`` partition,
    documents are laid end-to-end in ``order_col`` order into a token
    stream; a document's ``bin`` is the index of the ``capacity``-token
    window its FIRST token lands in (floor(start_offset / capacity)).
    This is the chunking used by fixed-context pretraining packers
    that concatenate-and-split rather than bin-pack: no reordering, no
    iteration, exactly reproducible — so shard boundaries stay stable
    across reruns (resumability requirement of the north rule).

    Returns (key, bin, n_docs, bin_tokens): documents per bin and the
    token mass STARTING in each bin (a document longer than
    ``capacity`` contributes all its tokens to its starting bin; the
    overflow spills into the next window at tensorization time).

    Scale: one shuffle on ``key`` + an in-partition sort for the
    running sum, then a map-side-combinable hash aggregate. The
    cumulative sum is per-key, never global — no single-task global
    ordering bottleneck.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    order = order_col if order_col is not None else F.col("doc_id").cast("bigint")
    w = Window.partitionBy(key).orderBy(order)
    cum = F.sum(n_tok_col).over(w)
    start = cum - F.col(n_tok_col)
    return (
        seq.withColumn("bin", F.floor(start / F.lit(float(capacity))))
        .groupBy(key, "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok_col).cast("bigint").alias("bin_tokens"),
        )
    )


# Acceptance thresholds are integer micro-units so the accept decision
# is an exact int64 comparison, never a float comparison at the
# boundary (cross-engine/rerun determinism).
_MICRO = 1_000_000


def temperature_rates(
    seq: DataFrame,
    key: str = "source",
    budget_frac: float = 0.25,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-key acceptance thresholds for temperature-0.5 domain mixing.

    Pretraining mixes flatten the natural domain distribution: with
    temperature alpha, the sampled token share of domain s should be
    proportional to share_s^alpha. For alpha = 1/2 the per-domain
    acceptance rate needs NO cross-domain normalizer:

        r_s = min(1, budget_frac * sqrt(N / n_s))
        E[kept tokens from s] = n_s * r_s ∝ sqrt(n_s)   (unclamped)

    which is exactly share^0.5 reweighting — hot domains are damped,
    tail domains sampled at (or near) rate 1. Avoiding the normalizer
    is what makes the rule cross-engine exact: N and n_s are exact
    integers, and /, sqrt, * are correctly-rounded IEEE ops, so DuckDB
    and Spark floor the SAME micro-unit threshold; a sum over domains
    would instead depend on accumulation order. ``budget_frac`` should
    be a binary-exact constant (0.25, 0.5) for the same reason.

    Returns (key, n_key_tokens, thr) where thr is in [0, 1e6]; a doc
    is kept iff its hash bucket (uniform in [0, 1e6)) < thr.
    Scale: one map-side-combinable aggregate; the rates frame is
    |domains| rows — always broadcastable.
    """
    stats = seq.groupBy(key).agg(F.sum(n_tok_col).cast("bigint").alias("n_key_tokens"))
    total = F.sum("n_key_tokens").over(Window.partitionBy())
    rate = F.least(
        F.lit(1.0),
        F.lit(float(budget_frac))
        * F.sqrt(total.cast("double") / F.col("n_key_tokens").cast("double")),
    )
    return stats.withColumn("thr", F.floor(rate * F.lit(_MICRO)).cast("bigint"))


def hash_bucket_expr(id_col: Column, buckets: int = _MICRO) -> Column:
    """Uniform deterministic bucket in [0, buckets) from the doc id:
    first 8 hex chars of md5(id as string) mod buckets — the same
    bucket DuckDB derives, so sampling decisions are engine-exact."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
        % F.lit(int(buckets))
    )


def temperature_sample(
    seq: DataFrame,
    key: str = "source",
    budget_frac: float = 0.25,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Deterministic temperature-0.5 domain-mixing sample.

    Joins the (broadcast) per-key thresholds back onto the corpus and
    keeps a document iff hash_bucket(doc_id) < thr — reproducible
    across runs, engines, and partitionings; no RNG state. One
    aggregate + one broadcast join: at 100 TB the corpus never
    shuffles, each task filters against a |domains|-row map.
    """
    rates = temperature_rates(seq, key=key, budget_frac=budget_frac, n_tok_col=n_tok_col)
    bucket = hash_bucket_expr(F.col(id_col))
    return (
        seq.join(F.broadcast(rates), key)
        .withColumn("bucket", bucket)
        .withColumn("kept", F.col("bucket") < F.col("thr"))
    )


def mixture_replicate(
    seq: DataFrame,
    weights: dict[str, float],
    key: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic fractional UPSAMPLING for training mixtures — the
    other half of data mixing (temperature_sample only downsamples):
    a mixture spec like {wiki: 2.5, books: 1.0, cc: 0.25} means every
    wiki doc appears 2 times plus a 3rd copy for half the docs, books
    pass through, and a quarter of cc survives.

    Each row of key s appears floor(w_s) times unconditionally, plus
    one more iff hash_bucket(id + '#rep') < frac(w_s) * 1e6 — the same
    engine-exact md5-bucket rule as temperature_sample (no RNG state;
    reproducible across runs, engines, partitionings; the '#rep' salt
    decorrelates the decision from every other sampling pass on the
    same ids). Keys absent from ``weights`` get ``default_weight``;
    weight 0 drops the key. Use binary-exact fractional parts (x.5,
    x.25) so the micro-unit threshold is engine-exact.

    Output: input columns + ``epoch`` (0-based copy index) — downstream
    per-epoch shuffling (sharding.epoch_shuffle) keys off (epoch, id)
    so the replicas don't ride adjacent. Pure Catalyst: one BROADCAST
    join against the |keys|-row spec + a map-side explode; the corpus
    never shuffles, output size = sum(w_s * n_s) rows by construction.
    """
    import math

    if default_weight < 0 or any(w < 0 for w in weights.values()):
        raise ValueError("mixture weights must be >= 0")

    def split(w: float) -> tuple[int, int]:
        full = int(math.floor(w))
        return full, int(round((w - full) * _MICRO))

    spark = seq.sparkSession
    rows = [(k, *split(w)) for k, w in weights.items()]
    wdf = spark.createDataFrame(
        rows, f"{key} string, _rbf_n_full bigint, _rbf_thr bigint"
    )
    d_full, d_thr = split(default_weight)
    bucket = hash_bucket_expr(
        F.concat(F.col(id_col).cast("string"), F.lit("#rep"))
    )
    copies = F.coalesce(F.col("_rbf_n_full"), F.lit(d_full)) + F.when(
        bucket < F.coalesce(F.col("_rbf_thr"), F.lit(d_thr)), 1
    ).otherwise(0)
    return (
        seq.join(F.broadcast(wdf), key, "left")
        .withColumn("_rbf_copies", copies)
        .where(F.col("_rbf_copies") > 0)
        .withColumn(
            "epoch",
            F.explode(
                F.sequence(F.lit(0), (F.col("_rbf_copies") - 1).cast("int"))
            ),
        )
        .drop("_rbf_n_full", "_rbf_thr", "_rbf_copies")
    )


def filter_sweep(
    df: DataFrame,
    key_col: str,
    score_col: str,
    thresholds: Sequence[float],
    *,
    mass_col: str | None = None,
) -> DataFrame:
    """Retention curve for tuning a quality-filter cutoff BEFORE
    committing a corpus-scale delete: for every candidate threshold t,
    how many documents (and how much ``mass_col`` — chars/tokens/bytes)
    survive ``score >= t``, per key. The decision table for "where do
    we set the quality bar": pick the knee where doc retention drops
    faster than mass retention (you are deleting short junk) or the
    cliff where a source vanishes entirely (the filter is biased
    against it — the fairness check curation reviews demand).

    Distributed shape: ONE map-side-combinable aggregate with
    2·|thresholds| conditional sums — the corpus is scanned once, no
    explode-by-threshold row multiplication, no bucket histogram
    intermediary; the |keys| result unpivots to |keys|·|thresholds|
    rows driver-side-free via stack(). Adding a threshold adds a
    column, not a pass.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = [round(float(t), 6) for t in thresholds]
    if len(set(ts)) != len(ts):
        raise ValueError(f"duplicate thresholds after rounding: {ts}")
    s = F.col(score_col)
    mass = F.col(mass_col) if mass_col else F.length(F.lit(""))
    aggs = [F.count("*").alias("_n"), F.sum(mass).alias("_m")]
    for i, t in enumerate(ts):
        keep = s >= F.lit(t)
        aggs.append(F.sum(F.when(keep, 1).otherwise(0)).alias(f"_n{i}"))
        aggs.append(F.sum(F.when(keep, mass).otherwise(0)).alias(f"_m{i}"))
    wide = df.groupBy(key_col).agg(*aggs)
    pairs = ", ".join(
        f"CAST({t!r} AS DOUBLE), _n{i}, _m{i}" for i, t in enumerate(ts)
    )
    long = wide.select(
        key_col,
        "_n",
        "_m",
        F.expr(
            f"stack({len(ts)}, {pairs}) as (threshold, docs_kept, mass_kept)"
        ),
    )
    return long.select(
        F.col(key_col),
        F.col("threshold"),
        F.col("docs_kept").cast("bigint").alias("docs_kept"),
        F.round(F.col("docs_kept") / F.col("_n"), 6).alias("frac_docs"),
        F.col("mass_kept").cast("bigint").alias("mass_kept"),
        F.round(F.try_divide(F.col("mass_kept"), F.col("_m")), 6).alias(
            "frac_mass"
        ),
    )


def chunk_windows(
    df: DataFrame,
    *,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    size: int,
    stride: int,
) -> DataFrame:
    """Sliding-window chunk plan: cut every token sequence into
    fixed-``size`` training windows advancing by ``stride`` (overlap =
    size − stride carries context across cuts) — the step between raw
    documents and ``pack_sequences``: packing fills context windows
    with WHOLE short docs; chunking makes long docs fit a context
    window at all.

    Emits the chunk MANIFEST (doc, chunk_idx, start, chunk_len,
    chunk_md5, is_last), not materialized slices — the md5 pins the
    exact token content of every window so a downstream writer can be
    audited, while the manifest stays a few dozen bytes per chunk.
    Coverage guarantees: chunks tile [0, n) (every token belongs to at
    least one chunk; the final chunk may run short — cap-aware
    consumers drop or pad it), n ≤ size yields exactly one chunk.
    Map-side only: sequence() + explode per row, no shuffle, no driver
    loop; empty docs are excluded.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 1 <= stride <= size:
        raise ValueError(f"need 1 <= stride <= size, got stride={stride}")
    n = F.size(F.col(tokens_col))
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.floor(
            (n - F.lit(size) + F.lit(stride) - F.lit(1)).cast("double")
            / F.lit(stride)
        ).cast("int")
        + 1
    )
    base = df.filter(n > 0).select(
        F.col(doc_col),
        F.col(tokens_col).alias("_toks"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        (n_chunks - 1).alias("_last"),
    )
    start = F.col("chunk_idx") * stride
    end = F.least(start + size, F.col("_n"))
    piece = F.slice(F.col("_toks"), start + 1, end - start)
    return base.select(
        F.col(doc_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start"),
        (end - start).cast("int").alias("chunk_len"),
        F.md5(
            F.array_join(F.transform(piece, lambda x: x.cast("string")), ",")
        ).alias("chunk_md5"),
        (F.col("chunk_idx") == F.col("_last")).alias("is_last"),
    )
