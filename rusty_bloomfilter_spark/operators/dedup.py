"""Deduplication operators for training-data pipelines.

Five dedup families over the `documents`/`sequences` tables, each
Spark-first: candidate generation shuffles only small signature rows
(never document text), verification is JVM-side column algebra where
possible. At 100 TB the LSH self-joins are the canonical pattern:
band/bucket keys are uniformly distributed by construction (hash
output), so the shuffle is skew-free, and each bucket's pair expansion
is bounded by bucket size.

- exact:      md5(text) groupBy (Catalyst; map-side partial agg)
- MinHash+LSH: shingle -> minhash signature (vectorized affine perms,
               segment-min via np.minimum.reduceat) -> banded LSH
               self-join -> signature-agreement verify (JVM zip_with)
- SimHash:    64-bit sign-sum sketch, Hamming-block LSH join
- n-gram Jaccard: exact set Jaccard on LSH candidates via shingle
               equi-join (no quadratic blowup)
- embedding:  random-hyperplane LSH over `embeddings`, exact cosine
               verify (JVM zip_with/aggregate)
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import combinations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketch.hashing import splitmix64
from .cache import tie
from .sketches import arrow_flat_tokens, arrow_row_lengths

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_docs,
    min_doc_id). Hash-groupBy — Catalyst does map-side partial agg, so
    the shuffle carries one row per distinct fingerprint per partition.
    """
    return (
        df.select(F.col("doc_id"), F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


# ---------------------------------------------------------------------------
# MinHash signatures + banded LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1  # classic prime for affine minhash perms


def _perm_coeffs(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    base = np.arange(1, n_hashes + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1)
    a = (splitmix64(base) % np.uint64(_MERSENNE - 1) + np.uint64(1)).astype(np.uint64)
    b = splitmix64(base ^ np.uint64(0xABCDEF)) % np.uint64(_MERSENNE)
    return a, b


def minhash_signatures(
    sequences: DataFrame,
    *,
    n_hashes: int = 128,
    shingle: int = 3,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, sig array<bigint>): minhash over within-row token
    shingles. Vectorized: one (total_shingles, H) affine transform per
    chunk, per-doc minimum via np.minimum.reduceat — no per-row Python.
    """
    a, b = _perm_coeffs(n_hashes)

    def sigs(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from .sketches import flat_ngram_hashes

        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            flat = arrow_flat_tokens(batch, tokens_col)
            lengths = arrow_row_lengths(batch, tokens_col)
            n_sh = np.maximum(lengths - (shingle - 1), 0)
            h = flat_ngram_hashes(flat, lengths, shingle)
            out = np.full((len(ids), n_hashes), _MERSENNE, dtype=np.uint64)
            if h.size:
                # chunk docs so the (n_shingles, H) temp stays small
                starts = np.concatenate(([0], np.cumsum(n_sh)))
                doc_lo = 0
                CH = max(1, (1 << 21) // n_hashes)  # ~2M cells per chunk
                while doc_lo < len(ids):
                    doc_hi = len(ids)
                    acc = 0
                    for d in range(doc_lo, len(ids)):
                        acc += n_sh[d]
                        if acc > CH:
                            doc_hi = max(d, doc_lo + 1)
                            break
                    lo, hi = starts[doc_lo], starts[doc_hi]
                    if hi > lo:
                        hh = h[lo:hi]
                        # (H, n) layout so each permutation's row is
                        # C-contiguous: the segment-min reduceat then
                        # walks sequential memory instead of striding
                        # across 128-column rows — measured 2.8x on the
                        # affine+reduceat pair, bit-identical (uint64
                        # wrap-multiply is commutative)
                        with np.errstate(over="ignore"):
                            vals = (a[:, None] * hh[None, :] + b[:, None]) % np.uint64(
                                _MERSENNE
                            )
                        seg = starts[doc_lo : doc_hi + 1] - lo
                        nonempty = np.flatnonzero(np.diff(seg) > 0)
                        seg_starts = seg[nonempty]
                        mins = np.minimum.reduceat(vals, seg_starts, axis=1)
                        out[doc_lo + nonempty] = mins.T
                    doc_lo = doc_hi
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": ids,
                    "sig": list(out.view(np.int64)),
                }
            )

    picked = sequences.select(id_col, tokens_col)
    return picked.mapInArrow(sigs, schema="doc_id string, sig array<bigint>")


def minhash_candidate_pairs(
    sig_df: DataFrame,
    *,
    bands: int = 32,
    threshold: float = 0.5,
    n_hashes: int | None = None,
) -> DataFrame:
    """Banded LSH: split each signature into `bands` bands, hash each,
    self-join docs sharing any band bucket, verify by signature
    agreement (JVM zip_with — an unbiased Jaccard estimate).

    Pass ``n_hashes`` (the signature width) to keep plan construction
    lazy; omitting it falls back to a driver ``first()`` action — an
    extra Spark job that recomputes the signature stage once.

    -> (doc_a, doc_b, est_jaccard) with est_jaccard >= threshold.
    """
    if n_hashes is None:
        first = sig_df.select("sig").first()
        if first is None:  # empty corpus -> no pairs
            spark = sig_df.sparkSession
            return spark.createDataFrame(
                [], "doc_a string, doc_b string, est_jaccard double"
            )
        n_hashes = len(first["sig"])
    r = n_hashes // bands
    band_cols = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.xxhash64(F.slice("sig", i * r + 1, r), i),
        )
    )
    # Decide with small rows, move heavy rows once (optimization guide
    # §2.3/§8, r6): the bucket self-join shuffles only (doc_id, band,
    # bucket) — ~24 B/row — never the 128-long signature (which made the
    # persisted+joined frame ~1 KB x bands per doc, measured 1.6 GB at
    # sf1.0). Signatures attach AFTER candidate pairs are deduplicated,
    # so the zip_with agreement verify also runs once per distinct pair
    # instead of once per shared bucket (a near-dup pair shares up to
    # `bands` buckets). Same output set: dedup-then-verify-then-filter
    # ≡ verify-then-filter-then-dedup (est_jaccard is a pure function
    # of the pair). sig_df is persisted: the bucket derivation reads it
    # twice (self-join sides) and the attach joins read it twice more —
    # without it the whole Python signature stage recomputes 4x.
    sigs = sig_df.persist()
    buckets = sigs.select("doc_id", band_cols.alias("band", "bucket"))
    left = buckets.alias("l")
    # shuffled-hash instead of sort-merge for the bucket self-join (r6,
    # guide §3.1): skips sorting 2x bands*n_docs rows; the build side's
    # per-partition footprint is (bands*n_docs/P) slim 24 B rows —
    # bucket keys are uniformly distributed by construction (hash
    # output), so partitions stay balanced at any scale and AQE skew
    # handling still applies to shuffled-hash joins. Measured ~2x on
    # the join stage at sf1.0.
    right = buckets.alias("r").hint("shuffle_hash")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = (
        cand.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.aggregate(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / F.lit(n_hashes)
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return tie(pairs, sigs)


def lsh_plan(
    threshold: float,
    *,
    n_hashes: int = 128,
    fn_weight: float = 1.0,
    fp_weight: float = 1.0,
) -> dict:
    """Choose (bands, rows_per_band) for ``minhash_candidate_pairs``
    from a target Jaccard ``threshold`` — the S-curve construction of
    Leskovec/Rajaraman/Ullman (MMDS ch. 3): a pair with similarity s
    shares at least one band bucket with probability
    p(s) = 1 - (1 - s^r)^b.

    Among every (b, r) with b*r == n_hashes, minimizes
    fn_weight * integral_t^1 (1-p(s)) ds  +  fp_weight * integral_0^t p(s) ds
    (false-negative mass above the threshold vs candidate-volume mass
    below it, 512-point midpoint rule — deterministic). fp_weight is
    the knob that matters at 100 TB: candidate volume drives the LSH
    self-join's shuffle, so weight it up when verification is the
    bottleneck and down when recall is contractual.

    -> dict(bands, rows, threshold_50, p_at_threshold, fn_mass,
    fp_mass): ``threshold_50 = (1/b)^(1/r)`` is where the S-curve
    crosses 1/2; ``p_at_threshold`` is the catch probability exactly
    at ``threshold``. Pure driver-side arithmetic — no jobs.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if n_hashes < 2:
        raise ValueError(f"n_hashes must be >= 2, got {n_hashes}")
    grid = [(i + 0.5) / 512 for i in range(512)]
    best = None
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        p = lambda s: 1.0 - (1.0 - s**r) ** b
        fn = sum(1.0 - p(s) for s in grid if s >= threshold) / 512
        fp = sum(p(s) for s in grid if s < threshold) / 512
        cost = fn_weight * fn + fp_weight * fp
        cand = {
            "bands": b,
            "rows": r,
            "threshold_50": (1.0 / b) ** (1.0 / r),
            "p_at_threshold": p(threshold),
            "fn_mass": fn,
            "fp_mass": fp,
            "cost": cost,
        }
        if best is None or cost < best["cost"]:
            best = cand
    return best


def minhash_dedup(
    sequences: DataFrame,
    *,
    n_hashes: int = 128,
    shingle: int = 3,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    sigs = minhash_signatures(sequences, n_hashes=n_hashes, shingle=shingle)
    return minhash_candidate_pairs(
        sigs, bands=bands, threshold=threshold, n_hashes=n_hashes
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    sequences: DataFrame, *, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """-> (doc_id, simhash bigint): 64-bit sign-sum sketch of the
    token-hash multiset (Charikar 2002). Vectorized bit unpack +
    per-doc segment sums."""

    def sigs(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            flat = arrow_flat_tokens(batch, tokens_col)
            lengths = arrow_row_lengths(batch, tokens_col)
            out = np.zeros(len(ids), dtype=np.uint64)
            if flat.size:
                h = splitmix64(flat.astype(np.int64).view(np.uint64))
                # (n_tokens, 64) bits as ±1, summed per doc, sign -> bit
                bits = np.unpackbits(h.view(np.uint8)).reshape(-1, 64)
                pm = bits.astype(np.int32) * 2 - 1
                # per-doc segment sums via prefix-sum differences along
                # axis 0: exact for empty docs anywhere in the batch
                # (clamped reduceat dropped the last doc's trailing
                # tokens when empty docs ended the batch)
                c = np.concatenate(
                    (np.zeros((1, 64), dtype=np.int64), np.cumsum(pm, axis=0, dtype=np.int64))
                )
                ends = np.cumsum(lengths)
                sums = c[ends] - c[ends - lengths]
                # empty doc -> sums row of 0 -> (sums > 0) all False -> all-zero simhash
                packed = np.packbits((sums > 0).astype(np.uint8), axis=1)
                out = packed.view(np.uint64).reshape(-1)
            yield pa.RecordBatch.from_pydict(
                {"doc_id": ids, "simhash": list(out.view(np.int64))}
            )

    return sequences.select(id_col, tokens_col).mapInArrow(
        sigs, schema="doc_id string, simhash bigint"
    )


def simhash_block_layout(n_blocks: int) -> tuple[list[int], list[int]]:
    """64 bits split into n_blocks contiguous ranges -> (starts, sizes)."""
    base, rem = divmod(64, n_blocks)
    sizes = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    starts = [sum(sizes[:i]) for i in range(n_blocks)]
    return starts, sizes


def simhash_bucket_keys(n_blocks: int, max_hamming: int):
    """Multi-block pigeonhole keys (Manku, Jain, Sarma, WWW'07 §3): a
    pair within Hamming distance d agrees on >= n_blocks - d of the
    n_blocks blocks, so each doc emits one key per (n_blocks - d)-block
    combination — the concatenated bits of those blocks.

    More blocks buy exponentially narrower buckets at linear key cost:
    n_blocks=4, d=3 is the classic 1-of-4 scheme (4 keys of 16 bits —
    at 10^8 docs each 16-bit bucket holds ~n/65536 docs and the
    self-join expands O((n/65536)^2) pairs per bucket); n_blocks=6, d=3
    emits C(6,3)=20 keys of 31-33 bits, shrinking expected bucket
    population ~2^16x for 5x the key rows. Returns the list of Spark
    key expressions (one per combination).
    """
    if max_hamming >= n_blocks:
        raise ValueError(f"need n_blocks > max_hamming, got {n_blocks} <= {max_hamming}")
    starts, sizes = simhash_block_layout(n_blocks)
    keep = n_blocks - max_hamming
    keys = []
    for combo in combinations(range(n_blocks), keep):
        expr = F.lit(0).cast("long")
        for bi in combo:
            blk = F.shiftrightunsigned(F.col("simhash"), starts[bi]).bitwiseAND(
                F.lit((1 << sizes[bi]) - 1)
            )
            expr = F.shiftleft(expr, sizes[bi]).bitwiseOR(blk)
        keys.append(expr)
    return keys


def simhash_near_dups(
    sig_df: DataFrame, *, max_hamming: int = 3, n_blocks: int = 6
) -> DataFrame:
    """Hamming-ball near-dups via multi-block pigeonhole LSH: join docs
    sharing any (n_blocks - d)-block key, verify with bit_count(xor).
    Exact for the given radius (zero false negatives by pigeonhole);
    n_blocks=4 reproduces the classic 1-of-4 16-bit scheme, the default
    n_blocks=6 uses C(6,3)=20 keys of 31-33 bits — the scale-safe
    bucketing (see simhash_bucket_keys).
    -> (doc_a, doc_b, hamming)."""
    keys = simhash_bucket_keys(n_blocks, max_hamming)
    blocks = F.posexplode(F.array(*keys))
    b_df = sig_df.select(
        "doc_id", "simhash", blocks.alias("block_idx", "block_val")
    ).persist()  # referenced twice by the self-join
    left = b_df.alias("l")
    right = b_df.alias("r")
    out = (
        left.join(
            right,
            (F.col("l.block_idx") == F.col("r.block_idx"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return tie(out, b_df)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard on candidate pairs
# ---------------------------------------------------------------------------


def shingle_sets(sequences: DataFrame, *, shingle: int = 3) -> DataFrame:
    """-> (doc_id, shingle_hash) distinct within-row token n-grams."""

    def rows(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        from .sketches import flat_ngram_hashes

        for batch in batches:
            ids = np.asarray(batch.column("doc_id").to_pylist())
            flat = arrow_flat_tokens(batch, "tokens")
            lengths = arrow_row_lengths(batch, "tokens")
            n_sh = np.maximum(lengths - (shingle - 1), 0)
            h = flat_ngram_hashes(flat, lengths, shingle)
            doc_of = np.repeat(np.arange(len(ids)), n_sh)
            # distinct (doc, shingle)
            key = np.stack([doc_of.astype(np.uint64), h], axis=1)
            if len(key):
                uniq = np.unique(key, axis=0)
                yield pa.RecordBatch.from_pydict(
                    {
                        "doc_id": ids[uniq[:, 0].astype(np.int64)],
                        "shingle_hash": uniq[:, 1].view(np.int64),
                    }
                )

    return sequences.select("doc_id", "tokens").mapInArrow(
        rows, schema="doc_id string, shingle_hash bigint"
    )


def shingle_sets_poly(sequences: DataFrame, *, shingle: int = 3) -> DataFrame:
    """-> (doc_id, shingle_hash) distinct within-row token n-grams keyed
    by the positional polynomial sum(tok[i+j] * 50261^(n-1-j)) — exactly
    injective for token ids < 50261 and reproducible verbatim in DuckDB
    (cross-engine oracle path; the default shingle_sets uses splitmix64,
    which no SQL engine reproduces). Pure Catalyst: no Python."""
    if not 2 <= shingle <= 4:
        raise ValueError("polynomial shingle keys support n in [2, 4] (int64 range)")
    muls = [50261 ** (shingle - 1 - j) for j in range(shingle)]

    def key(i):
        terms = [
            F.element_at("tokens", i + j + 1).cast("long") * F.lit(muls[j]).cast("long")
            for j in range(shingle)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    grams = F.transform(F.sequence(F.lit(0), F.size("tokens") - shingle), key)
    return (
        sequences.filter(F.size("tokens") >= shingle)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle_hash"))
    )


def ngram_jaccard_pairs(
    sequences: DataFrame,
    candidates: DataFrame,
    *,
    shingle: int = 3,
    exact_keys: bool = False,
) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via shingle
    equi-join: |A ∩ B| from a co-group on shingle_hash restricted to
    candidate pairs, |A ∪ B| = |A| + |B| − |A ∩ B|.

    Scale-critical ordering: the candidate doc-id set is broadcast and
    semi-joined against the sequences BEFORE shingles are computed or
    self-joined, so only candidate docs' shingles ever enter the
    equi-join. Without this, a stop-word-like shingle appearing in D
    docs expands to O(D²) join rows corpus-wide; with it, the expansion
    is bounded by the candidate set. Pairs with an empty intersection
    are not emitted (they never meet in the equi-join).

    ``exact_keys=True`` uses the DuckDB-reproducible polynomial shingle
    key (injective for vocab < 50261) instead of splitmix64.
    """
    cand = candidates.select("doc_a", "doc_b")
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    restricted = sequences.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    sh = (
        shingle_sets_poly(restricted, shingle=shingle)
        if exact_keys
        else shingle_sets(restricted, shingle=shingle)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle_hash") == F.col("b.shingle_hash")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
        .join(F.broadcast(cand), ["doc_a", "doc_b"], "left_semi")
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding near-duplicates (cosine >= threshold)
# ---------------------------------------------------------------------------


def _dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm_expr(a):
    """sqrt(sum of squares) — hoist onto each vector frame ONCE (r6):
    _cosine_expr per pair re-folds both norms for every pair, tripling
    the higher-order-function work. dot/(na*nb) on precomputed norm
    columns is value-identical (same folds, IEEE mult/div of the same
    doubles)."""
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )


def _cosine_expr(a, b):
    dot = _dot_expr(a, b)
    return dot / (_norm_expr(a) * _norm_expr(b))


def embedding_near_dups(
    embeddings: DataFrame,
    *,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH (Charikar): sign bits of W·v bucket the
    vectors; near-identical vectors agree on whole sign-bands w.h.p.
    Verify candidates with exact cosine (JVM-side zip_with).
    -> (id_a, id_b, cosine >= threshold).

    Pass ``dim`` (the embedding width) to keep plan construction lazy;
    omitting it falls back to a driver ``first()`` — an extra Spark job.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def sign_bits(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vecs = np.stack(
                batch.column(vec_col).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            proj = vecs @ planes.T > 0
            bits = np.packbits(proj, axis=1, bitorder="little")
            width = bits.shape[1]
            pad = np.zeros((len(ids), 8 - width % 8), dtype=np.uint8) if width % 8 else None
            if pad is not None:
                bits = np.concatenate([bits, pad], axis=1)
            sig = bits[:, :8].copy().view(np.int64).reshape(-1)
            yield pa.RecordBatch.from_pydict({"vid": ids.tolist(), "sig": sig.tolist()})

    sigs = embeddings.select(id_col, vec_col).mapInArrow(
        sign_bits, schema="vid bigint, sig bigint"
    )
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    band_exp = F.posexplode(
        F.array(*[
            F.shiftrightunsigned(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ])
    )
    b_df = sigs.select("vid", band_exp.alias("band", "bucket")).persist()
    cand = (
        b_df.alias("l")
        .join(
            b_df.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nv", _norm_expr(F.col("v")))  # norm once per vector (r6)
    out = (
        cand.join(
            e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nv").alias("na")),
            "id_a",
        )
        .join(
            e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nv").alias("nb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(_dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return tie(out, b_df)


# ---------------------------------------------------------------------------
# Bigram-LM likelihood scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------


def bigram_lm_scores(
    sequences: DataFrame,
    *,
    vocab: int = 50257,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-LM fluency score — the standard perplexity
    quality filter of training-data curation, with an add-one-smoothed
    bigram model trained on the corpus itself:

        score(doc) = mean over adjacent pairs (a,b) of
                     ln( (count(a,b) + 1) / (count(a) + vocab) )

    Low (very negative) scores mark documents whose token transitions
    are rare in the corpus — boilerplate, noise, wrong-language text.
    All counting and scoring is Catalyst: one pair-count and one
    unigram-count aggregation (map-side combined), joined back against
    the exploded pairs, one mean per doc. Cross-engine exact: the same
    arithmetic renders in DuckDB (see q_bigram_lm_scores).

    Scale shape: the UNIGRAM table is vocab-bounded (<= ~10^5 rows) and
    broadcast; the BIGRAM table grows toward min(total_pairs, vocab^2)
    — billions of rows at GPT-2 vocab on a large corpus — so it is
    joined with an explicit shuffle-merge hint on ``pair``, never
    broadcast (a broadcast here is a guaranteed driver/executor OOM at
    100 TB; AQE may still locally convert small shuffles).

    -> (doc_id, n_pairs, lm_score) for docs with >= 2 tokens.
    """
    from ..functions.text import adjacent_pair_keys

    pair_base = 1 << 20
    pairs = sequences.select(
        F.col(id_col).alias("doc_id"),
        F.explode(adjacent_pair_keys(F.col(tokens_col), vocab=pair_base)).alias("pair"),
    )
    bigram = pairs.groupBy("pair").agg(F.count("*").alias("c2"))
    unigram = (
        sequences.select(F.explode(tokens_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    scored = (
        pairs.join(bigram.hint("merge"), "pair")
        .withColumn("left_tok", F.expr(f"pair DIV {pair_base}"))
        .join(F.broadcast(unigram), F.col("left_tok") == F.col("tok"))
        .select(
            "doc_id",
            F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + vocab)).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_pairs"), F.round(F.avg("lp"), 6).alias("lm_score")
    )


def dedup_savings(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    fp_col: str = "fp",
    weight_col: str = "n_tok",
) -> DataFrame:
    """What would exact dedup reclaim, per group — the sizing report
    read BEFORE running the dedup pass (is it worth a corpus rewrite?)
    and the attribution report after (WHICH feed ships the copies):
    per group, duplicate docs (keep-first by id within each
    fingerprint, the exact_dedup canonical rule) and the token mass
    they waste. Duplicates are attributed to the group of the COPY,
    not the canonical holder — a mirror site shows up in its own row.

    One window per fingerprint (rank by id) + one group aggregate;
    shuffle is one hash exchange on the fingerprint over (fp, id,
    group, weight) rows — the same plan shape as exact_dedup itself,
    so the report costs what one dedup candidate pass costs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(fp_col).orderBy(F.col(id_col).asc())
    ranked = df.select(
        F.col(group_col),
        F.col(weight_col).cast("bigint").alias("_w"),
        (F.row_number().over(w) > 1).alias("_dup"),
    )
    return ranked.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_w").alias("total_tokens"),
        F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_dup_docs"),
        F.sum(F.when(F.col("_dup"), F.col("_w")).otherwise(0)).alias(
            "dup_tokens"
        ),
        F.round(
            F.sum(F.when(F.col("_dup"), 1).otherwise(0)) / F.count("*"), 6
        ).alias("frac_dup_docs"),
        # try_divide: a group of all-zero-weight docs has sum(_w)=0 and
        # ANSI double/0 THROWS — report NULL, never crash the report
        F.round(
            F.try_divide(
                F.sum(F.when(F.col("_dup"), F.col("_w")).otherwise(0)),
                F.sum("_w"),
            ),
            6,
        ).alias("frac_dup_tokens"),
    )
