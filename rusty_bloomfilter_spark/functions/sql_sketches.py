"""Sketches as SQL aggregate/scalar functions.

``register_sketch_sql(spark)`` makes the sketch library usable from
pure SQL — every mergeable summary in the library has an agg/estimate
pair: ``hll_agg``/``hll_estimate``, ``bloom_agg``/``bloom_estimate_n``,
``cms_agg``/``cms_query``, ``kll_agg``/``kll_quantile``,
``dd_agg``/``dd_quantile`` (DDSketch relative-error quantiles),
``mg_agg``/``mg_candidates``, ``gram_agg``/``gram_eigvals``,
``ams_agg``/``ams_f2``/``ams_query`` (unbiased signed frequencies +
the F2 skew oracle), the deletable-membership pair
``cbf_agg``/``cbf_subtract``, the exact-reconciliation pair
``iblt_agg``/``iblt_diff`` (entry key+1 means only-in-a, -(key+1)
only-in-b — shifted because key 0 has no sign), and ``sketch_merge`` — a GROUPED_AGG
payload merge for ANY registry kind, so finest-grain sketch cells roll
up to coarser groups in pure SQL without re-scanning the source:

    SELECT source,
           hll_estimate(hll_agg(tokens))      AS distinct_est,
           bloom_estimate_n(bloom_agg(tokens)) AS distinct_est2
    FROM sequences GROUP BY source

plus the deletable-membership pair: ``cbf_agg(key)`` (counting Bloom
over a scalar int64 key) and ``cbf_subtract(corpus, revoked)``.

The aggregates are Arrow-batched GROUPED_AGG pandas UDFs returning the
canonical serialized payload (bitwise identical to the tree-merge
builders — canonical bytes are a pure function of the inserted set).

Scale note: a GROUPED_AGG UDF materializes each group on one worker —
there is NO partial aggregation, unlike the tree-merge pipeline
(operators/aggregate.py), which is the right tool for huge groups.
These SQL functions are the convenience surface for ad-hoc queries and
moderate group sizes; the docstring contract mirrors Spark's own
grouped-agg limitation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..sketch import BloomFilter, HyperLogLog, Shape


def _probe_int(t):
    """Nullable per-row token -> exact python int or None.

    An int64 token column WITH NULLS reaches a pandas UDF as float64
    (Arrow->pandas promotion): the NULL rows arrive as NaN (never
    ``None``) and must yield NULL, and |v| >= 2^53 floats have already
    lost the original key — fail loudly rather than probe a rounded
    value (same contract as operators.sketches._series_probe_values).
    """
    if t is None:
        return None
    if isinstance(t, float):
        if math.isnan(t):
            return None
        if abs(t) >= 2.0**53:
            raise ValueError(
                "token column arrived as float64 (nullable-int64 promotion) "
                "with |value| >= 2^53; the original integer key is "
                "unrecoverable — filter NULLs out of the token column first"
            )
    return int(t)


_CACHE_CAP = 32  # distinct payloads per python worker before reset


def _cached_sketch(cache: dict, payload):
    """Deserialize a sketch payload once per distinct bytes (the usual
    shape is N rows sharing one aggregated payload — per-row from_bytes
    would copy the whole table N times)."""
    key = bytes(payload)
    sk = cache.get(key)
    if sk is None:
        from ..sketch import sketch_from_bytes

        if len(cache) >= _CACHE_CAP:
            cache.clear()
        sk = cache[key] = sketch_from_bytes(key)
    return sk


def register_sketch_sql(
    spark: SparkSession,
    *,
    hll_p: int = 14,
    bloom_n: int = 200_000,
    bloom_p: float = 1e-4,
    mg_capacity: int = 1024,
    gram_dim: int = 64,
    cms_d: int = 5,
    cms_w: int = 8192,
    kll_k: int = 200,
    dd_alpha: float = 0.01,
    ams_d: int = 5,
    ams_w: int = 8192,
    iblt_max_diff: int = 4096,
    prefix: str = "",
) -> None:
    """Register hll_agg / hll_estimate / bloom_agg / bloom_estimate_n
    (optionally name-prefixed) in the session's SQL function registry."""
    shape = Shape.for_np(n=bloom_n, p=bloom_p)

    @pandas_udf("binary")
    def hll_agg(tokens: pd.Series) -> bytes:
        hll = HyperLogLog(hll_p)
        arrs = [np.asarray(a, dtype=np.int64) for a in tokens if a is not None and len(a)]
        if arrs:
            hll.add_tokens(np.concatenate(arrs))
        return hll.to_bytes()

    @pandas_udf("double")
    def hll_estimate(payload: pd.Series) -> pd.Series:
        return pd.Series(
            [
                float("nan") if p is None else HyperLogLog.from_bytes(bytes(p)).estimate()
                for p in payload
            ]
        )

    @pandas_udf("binary")
    def bloom_agg(tokens: pd.Series) -> bytes:
        from ..sketch import SparseBloomBuilder

        bf = SparseBloomBuilder(shape)
        arrs = [np.asarray(a, dtype=np.int64) for a in tokens if a is not None and len(a)]
        if arrs:
            bf.add_tokens(np.concatenate(arrs))
        return bf.to_bytes()

    @pandas_udf("double")
    def bloom_estimate_n(payload: pd.Series) -> pd.Series:
        return pd.Series(
            [
                float("nan") if p is None else BloomFilter.from_bytes(bytes(p)).estimate_n()
                for p in payload
            ]
        )

    @pandas_udf("binary")
    def cbf_agg(keys: pd.Series) -> bytes:
        # counting Bloom over a SCALAR int64 key column (doc ids) —
        # multiplicity IS the counter state, so no dedup fold
        from ..sketch import CountingBloomFilter

        cbf = CountingBloomFilter.empty(shape)
        vals = keys.dropna().to_numpy()
        if vals.dtype.kind == "f":
            # int64-with-NULLs arrives as float64 (Arrow->pandas
            # promotion); floats are exact only below 2^53 — beyond
            # that the original key is unrecoverable, so fail loudly
            # instead of silently inserting a rounded key (which would
            # make the true key probe False: a false negative).
            if vals.size and np.abs(vals).max() >= 2.0**53:
                raise ValueError(
                    "cbf_agg: nullable int64 keys arrive as float64 and "
                    "|key| >= 2^53 cannot be recovered exactly; filter "
                    "NULLs out first (WHERE key IS NOT NULL)"
                )
            vals = vals.astype(np.int64)
        else:
            vals = vals.astype(np.int64, copy=False)
        if vals.size:
            cbf.add_tokens(vals)
        return cbf.to_bytes()

    @pandas_udf("binary")
    def iblt_agg(keys: pd.Series) -> bytes:
        # invertible difference table over a scalar int64 key column;
        # SET semantics — duplicate keys within the group XOR-cancel,
        # so feed DISTINCT keys (sketch/iblt.py docstring)
        from ..sketch.iblt import IBLT

        t = IBLT.for_diff(iblt_max_diff)
        vals = keys.dropna().to_numpy()
        if vals.dtype.kind == "f":
            if vals.size and np.abs(vals).max() >= 2.0**53:
                raise ValueError(
                    "iblt_agg: nullable int64 keys arrive as float64 and "
                    "|key| >= 2^53 cannot be recovered exactly; filter "
                    "NULLs out first (WHERE key IS NOT NULL)"
                )
            vals = vals.astype(np.int64)
        if vals.size:
            t.add_u64(np.unique(vals.astype(np.int64)).astype(np.uint64))
        return t.to_bytes()

    @pandas_udf("array<bigint>")
    def iblt_diff(a: pd.Series, b: pd.Series) -> pd.Series:
        # exact two-sided diff of two iblt_agg payloads: entry
        # (key + 1) means key only in a, -(key + 1) only in b — the
        # +1 shift because key 0 has no sign (-0 == 0); keys must be
        # < 2^62 - 1 (md5-60-bit and id keys are). Raises on decode
        # failure, never truncates.
        from ..sketch.iblt import IBLT

        out = []
        for pa_, pb in zip(a, b):
            if pa_ is None or pb is None:
                out.append(None)
                continue
            d = IBLT.from_bytes(bytes(pa_)).subtract(IBLT.from_bytes(bytes(pb)))
            add, rem, ok = d.peel()
            if not ok:
                raise ValueError(
                    "iblt_diff: decode incomplete — difference exceeds the "
                    "table's max_diff; rebuild iblt_agg with a larger bound"
                )
            hi = max(int(add.max()) if add.size else 0, int(rem.max()) if rem.size else 0)
            if hi >= 2**62 - 1:
                raise ValueError("iblt_diff: key >= 2^62-1 breaks the sign encoding")
            out.append(
                sorted(int(x) + 1 for x in add.astype(np.int64))
                + sorted(-(int(x) + 1) for x in rem.astype(np.int64))
            )
        return pd.Series(out)

    @pandas_udf("binary")
    def cbf_subtract(a: pd.Series, b: pd.Series) -> pd.Series:
        # filter-level revocation: corpus payload minus revoke payload
        # (sticky-saturation contract, sketch/counting.py)
        from ..sketch import CountingBloomFilter

        out = []
        for pa_, pb in zip(a, b):
            if pa_ is None or pb is None:
                out.append(None)
                continue
            f = CountingBloomFilter.from_bytes(bytes(pa_))
            f.subtract_in_place(CountingBloomFilter.from_bytes(bytes(pb)))
            out.append(f.to_bytes())
        return pd.Series(out)

    @pandas_udf("binary")
    def cms_agg(tokens: pd.Series) -> bytes:
        # Count-Min frequency sketch over an array<int> column
        from ..sketch import CountMinSketch

        cms = CountMinSketch(d=cms_d, w=cms_w)
        arrs = [np.asarray(a, dtype=np.int64) for a in tokens if a is not None and len(a)]
        if arrs:
            cms.add_tokens(np.concatenate(arrs))
        return cms.to_bytes()

    cms_cache: dict = {}

    @pandas_udf("bigint")
    def cms_query(payload: pd.Series, token: pd.Series) -> pd.Series:
        # estimated count of one token per row (>= true count;
        # overshoot <= eps*N with prob 1-delta). NULL token -> NULL;
        # payloads deserialize once per distinct bytes, not per row.
        out = []
        for p, t in zip(payload, token):
            # payload check FIRST: a NULL-payload row answers NULL no
            # matter the token — the >=2^53 guard must not fire for it
            tok = None if p is None else _probe_int(t)
            if p is None or tok is None:
                out.append(None)
                continue
            cms = _cached_sketch(cms_cache, p)
            out.append(int(cms.query_tokens(np.asarray([tok], dtype=np.int64))[0]))
        return pd.Series(out, dtype="object")

    @pandas_udf("binary")
    def kll_agg(values: pd.Series) -> bytes:
        # KLL quantile sketch over a SCALAR numeric column
        from ..sketch import KLLSketch

        kll = KLLSketch(k=kll_k)
        vals = values.dropna().to_numpy(dtype=np.float64)
        if vals.size:
            kll.update_batch(vals)
        return kll.to_bytes()

    kll_cache: dict = {}

    @pandas_udf("double")
    def kll_quantile(payload: pd.Series, q: pd.Series) -> pd.Series:
        out = []
        for p, qq in zip(payload, q):
            # a NULL q arrives as NaN (double promotion): must yield
            # NULL, not quantile(nan) == the sketched max
            if p is None or qq is None or (isinstance(qq, float) and math.isnan(qq)):
                out.append(None)
                continue
            out.append(float(_cached_sketch(kll_cache, p).quantile(float(qq))))
        return pd.Series(out, dtype="float64")

    @pandas_udf("binary")
    def dd_agg(values: pd.Series) -> bytes:
        # DDSketch RELATIVE-error quantile sketch over a scalar numeric
        # column; canonical bytes under any partitioning (unlike KLL)
        from ..sketch import DDSketch

        dd = DDSketch(dd_alpha)
        vals = values.dropna().to_numpy(dtype=np.float64)
        if vals.size:
            dd.add(vals)
        return dd.to_bytes()

    dd_cache: dict = {}

    @pandas_udf("double")
    def dd_quantile(payload: pd.Series, q: pd.Series) -> pd.Series:
        out = []
        for p, qq in zip(payload, q):
            if p is None or qq is None or (isinstance(qq, float) and math.isnan(qq)):
                out.append(None)
                continue
            sk = _cached_sketch(dd_cache, p)
            out.append(None if sk.n_items == 0 else float(sk.quantile(float(qq))))
        return pd.Series(out, dtype="float64")

    @pandas_udf("binary")
    def ams_agg(tokens: pd.Series) -> bytes:
        # count sketch (AMS) over an array<int> column: unbiased signed
        # frequencies + the F2 second-moment skew oracle
        from ..sketch import CountSketch

        cs = CountSketch(d=ams_d, w=ams_w)
        arrs = [np.asarray(a, dtype=np.int64) for a in tokens if a is not None and len(a)]
        if arrs:
            cs.add_tokens(np.concatenate(arrs))
        return cs.to_bytes()

    @pandas_udf("bigint")
    def ams_f2(payload: pd.Series) -> pd.Series:
        # second frequency moment estimate (per-row rel-std sqrt(2/w))
        from ..sketch import CountSketch

        out = []
        for p in payload:
            out.append(None if p is None else int(CountSketch.from_bytes(bytes(p)).f2()))
        return pd.Series(out, dtype="object")

    ams_cache: dict = {}

    @pandas_udf("bigint")
    def ams_query(payload: pd.Series, token: pd.Series) -> pd.Series:
        # unbiased two-sided frequency estimate of one token per row
        out = []
        for p, t in zip(payload, token):
            tok = None if p is None else _probe_int(t)  # payload first
            if p is None or tok is None:
                out.append(None)
                continue
            cs = _cached_sketch(ams_cache, p)
            out.append(int(cs.query_tokens(np.asarray([tok], dtype=np.int64))[0]))
        return pd.Series(out, dtype="object")

    @pandas_udf("binary")
    def sketch_merge(payloads: pd.Series) -> bytes:
        # GROUPED_AGG payload merge, any registry kind (magic
        # dispatch): rolls finest-grain sketch cells up to coarser
        # groups in pure SQL without re-scanning the source —
        # SELECT source, hll_estimate(sketch_merge(payload))
        # FROM cells GROUP BY source
        from ..sketch import merge_sketch_payloads

        present = [bytes(p) for p in payloads if p is not None]
        # SQL aggregate semantics: a group with no non-NULL payloads
        # yields NULL, never a task-crashing ValueError
        return merge_sketch_payloads(present) if present else None

    @pandas_udf("binary")
    def mg_agg(tokens: pd.Series) -> bytes:
        # Misra-Gries heavy-hitter summary over an array<int> column
        from ..sketch import MisraGries

        mg = MisraGries(capacity=mg_capacity)
        arrs = [np.asarray(a, dtype=np.int64) for a in tokens if a is not None and len(a)]
        if arrs:
            mg.add_tokens(np.concatenate(arrs))
        return mg.to_bytes()

    @pandas_udf("array<bigint>")
    def mg_candidates(payload: pd.Series, threshold: pd.Series) -> pd.Series:
        # tokens possibly above the per-row threshold (guaranteed
        # superset when threshold >= n_items/(capacity+1))
        from ..sketch import MisraGries

        out = []
        for p, t in zip(payload, threshold):
            thr = _probe_int(t)  # nullable-int promotion guard
            if p is None or thr is None:
                out.append(None)
                continue
            mg = MisraGries.from_bytes(bytes(p))
            out.append([int(v) for v in mg.candidates_above(thr).view(np.int64)])
        return pd.Series(out)

    @pandas_udf("binary")
    def gram_agg(vecs: pd.Series) -> bytes:
        # exact Gram over an array<float> column (fixed width gram_dim;
        # NULL / wrong-width rows skipped, same contract as the
        # spectral operators)
        from ..sketch import GramMatrix

        g = GramMatrix(gram_dim)
        rows = [
            np.asarray(v, dtype=np.float64)
            for v in vecs
            if v is not None and len(v) == gram_dim
        ]
        if rows:
            g.add_rows(np.stack(rows))
        return g.to_bytes()

    @pandas_udf("array<double>")
    def gram_eigvals(payload: pd.Series) -> pd.Series:
        from ..sketch import GramMatrix

        return pd.Series(
            [
                None if p is None else [float(x) for x in GramMatrix.from_bytes(bytes(p)).eigh()[0]]
                for p in payload
            ]
        )

    spark.udf.register(prefix + "hll_agg", hll_agg)
    spark.udf.register(prefix + "hll_estimate", hll_estimate)
    spark.udf.register(prefix + "bloom_agg", bloom_agg)
    spark.udf.register(prefix + "bloom_estimate_n", bloom_estimate_n)
    spark.udf.register(prefix + "cbf_agg", cbf_agg)
    spark.udf.register(prefix + "cbf_subtract", cbf_subtract)
    spark.udf.register(prefix + "iblt_agg", iblt_agg)
    spark.udf.register(prefix + "iblt_diff", iblt_diff)
    spark.udf.register(prefix + "cms_agg", cms_agg)
    spark.udf.register(prefix + "cms_query", cms_query)
    spark.udf.register(prefix + "kll_agg", kll_agg)
    spark.udf.register(prefix + "kll_quantile", kll_quantile)
    spark.udf.register(prefix + "dd_agg", dd_agg)
    spark.udf.register(prefix + "dd_quantile", dd_quantile)
    spark.udf.register(prefix + "sketch_merge", sketch_merge)
    spark.udf.register(prefix + "ams_agg", ams_agg)
    spark.udf.register(prefix + "ams_f2", ams_f2)
    spark.udf.register(prefix + "ams_query", ams_query)
    spark.udf.register(prefix + "mg_agg", mg_agg)
    spark.udf.register(prefix + "mg_candidates", mg_candidates)
    spark.udf.register(prefix + "gram_agg", gram_agg)
    spark.udf.register(prefix + "gram_eigvals", gram_eigvals)
