"""Exact set-similarity self-join with prefix filtering (Chaudhuri,
Ganti & Kaushik, ICDE 2006; Xiao et al., "Efficient Similarity Joins
for Near Duplicate Detection", WWW 2008 — the PPJoin family).

Finds EVERY unordered pair of documents whose token-set Jaccard is
>= tau — no false negatives, unlike the MinHash+LSH path
(operators/dedup.py), which trades recall for speed. This is the
"audit the sketch" operator: run it on a sample to measure LSH recall,
or on a blocked subset where exactness is required.

Prefix-filtering principle: order the UNIVERSE of tokens once (we use
ascending document frequency, rarest first — the standard choice that
minimizes candidates). For a document d sorted in that order, its
prefix is the first ``|d| - ceil(tau*|d|) + 1`` tokens. If
J(a,b) >= tau then |a ∩ b| >= ceil(tau/(1+tau) * (|a|+|b|)) >= 1, and
a counting argument shows the two PREFIXES must share at least one
token: if they were disjoint in the shared ordering, the overlap is
at most min(|a| - pref(a), |b| - pref(b)) < tau * min(|a|,|b|)
<= |a ∩ b| — contradiction. So "prefixes share a token" is a COMPLETE
candidate generator, and the exact verify step makes it sound.

Length filter (also lossless): J(a,b) >= tau implies
min(|a|,|b|) >= tau * max(|a|,|b|), applied at candidate time.

Distributed shape (the part that survives 100 TB):
- token df: one map-side-combined aggregate over exploded tokens.
- ordering join: (doc, token) joins (token, df) co-partitioned on the
  token — the only corpus-sized shuffle besides the explode itself.
- prefix emission: window over doc_id (orders tokens by (df, token)
  per doc) then a FILTER — only ~(1-tau) of each doc's tokens survive;
  at tau=0.8, the self-joined relation is 5x smaller than the corpus,
  and candidates are bounded by prefix-token collisions, not |docs|².
- a rare token appears in few prefixes, a frequent token appears LATE
  in every doc's ordering and rarely makes any prefix: the join key
  distribution is anti-skewed by construction.
- verify: candidates (distinct) join the doc->sorted-token-array frame
  twice; array_intersect runs JVM-side. The token-set frame is
  persisted + tied (self-join recompute rule, operators/cache.py).

Oracle strategy: the contract query pins the FULL output against
DuckDB's quadratic list_intersect join at sf0.01 — the quadratic form
is the spec, the prefix-filtered form is the plan.

Reference parity: the reference library (/root/reference/src/
bloomfilter/) has only probabilistic membership; exact similarity
joins extend the dedup family beyond what it offers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cache import tie


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    tau: float,
) -> DataFrame:
    """All pairs (a, b), a < b by id, with token-set Jaccard >= tau.

    ``tokens_col`` is an array column; duplicates within a document are
    collapsed (set semantics). Documents with empty token sets never
    pair (Jaccard with an empty set is 0 or undefined; both < tau).

    Returns (doc_a, doc_b, inter, union_sz, jaccard) with jaccard a
    double in [tau, 1].
    """
    if not (0.0 < tau <= 1.0):
        raise ValueError(f"tau must be in (0, 1], got {tau}")

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(tokens_col)).alias("_ts"),
    ).filter(F.size("_ts") > 0)

    # (doc, token) pairs + global document frequency per token
    pairs = base.select("_id", F.explode("_ts").alias("_tok"))
    df_tok = pairs.groupBy("_tok").agg(F.count("*").alias("_df"))

    # per-doc ordering by (df asc, token asc); prefix length
    # L = |d| - ceil(tau*|d|) + 1
    w_doc = Window.partitionBy("_id").orderBy("_df", "_tok")
    sized = (
        pairs.join(df_tok, "_tok")
        .withColumn("_pos", F.row_number().over(w_doc))
        .withColumn("_sz", F.count("*").over(Window.partitionBy("_id")))
    )
    prefix = sized.filter(
        F.col("_pos") <= F.col("_sz") - F.ceil(F.lit(tau) * F.col("_sz")) + 1
    ).select("_tok", "_id", "_sz")

    # candidates: prefixes sharing a token + lossless length filter.
    # persist: self-join would otherwise recompute the window stage
    # per side.
    prefix = prefix.persist()
    a = prefix.select(
        F.col("_tok"), F.col("_id").alias("_ida"), F.col("_sz").alias("_sza")
    )
    b = prefix.select(
        F.col("_tok"), F.col("_id").alias("_idb"), F.col("_sz").alias("_szb")
    )
    cand = (
        a.join(b, "_tok")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            F.least("_sza", "_szb").cast("double")
            >= F.lit(tau) * F.greatest("_sza", "_szb").cast("double")
        )
        .select("_ida", "_idb")
        .distinct()
    )

    # exact verify against the full sorted sets
    sets = base.select(
        F.col("_id"), F.sort_array("_ts").alias("_set"), F.size("_ts").alias("_n")
    ).persist()
    sa = sets.select(
        F.col("_id").alias("_ida"), F.col("_set").alias("_seta"), F.col("_n").alias("_na")
    )
    sb = sets.select(
        F.col("_id").alias("_idb"), F.col("_set").alias("_setb"), F.col("_n").alias("_nb")
    )
    inter = F.size(F.array_intersect("_seta", "_setb"))
    verified = (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .withColumn("inter", inter)
        .withColumn("union_sz", F.col("_na") + F.col("_nb") - F.col("inter"))
        .withColumn(
            "jaccard", F.col("inter").cast("double") / F.col("union_sz").cast("double")
        )
        .filter(F.col("jaccard") >= F.lit(tau))
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            F.col("inter").cast("long").alias("inter"),
            F.col("union_sz").cast("long").alias("union_sz"),
            F.col("jaccard"),
        )
    )
    return tie(verified, prefix, sets)


def containment_join(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    tau: float,
) -> DataFrame:
    """All DIRECTED pairs (a, b), a != b, with |a ∩ b| / |a| >= tau —
    containment (a.k.a. Jaccard containment / overlap coefficient
    toward a): "document a is (mostly) an excerpt of b". The
    asymmetric sibling of :func:`jaccard_similarity_join`, and the
    cross-DOCUMENT quote/excerpt detector the within-corpus span
    operators (operators/spans.py) don't cover: a short doc fully
    quoted inside a long one has tiny Jaccard but containment 1.

    Completeness: order the token universe rarest-first as in the
    Jaccard join. If prefix(a) of length |a| - ceil(tau·|a|) + 1 is
    disjoint from b's FULL set, then a ∩ b ⊆ a \\ prefix(a), so
    |a ∩ b| <= ceil(tau·|a|) - 1 < tau·|a| — contradiction. So the
    candidate generator "a's prefix token appears anywhere in b" is
    complete; the exact verify makes it sound. The lossless length
    filter is one-sided: |b| >= tau·|a| (a huge b may contain a tiny
    a — that asymmetry is the whole point, so no upper bound).

    Skew note: the probe side joins PREFIX rows (rare tokens by
    construction) against the full inverted index, so per-token join
    output is (#prefixes holding t) × df_t — small × large, never
    large × large; the frequent tokens that dominate df almost never
    make any prefix.

    Returns (doc_a, doc_b, inter, size_a, containment), containment in
    [tau, 1], doc_a the contained side.
    """
    if not (0.0 < tau <= 1.0):
        raise ValueError(f"tau must be in (0, 1], got {tau}")

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(tokens_col)).alias("_ts"),
    ).filter(F.size("_ts") > 0)

    pairs = base.select("_id", F.explode("_ts").alias("_tok"))
    df_tok = pairs.groupBy("_tok").agg(F.count("*").alias("_df"))
    w_doc = Window.partitionBy("_id").orderBy("_df", "_tok")
    sized = (
        pairs.join(df_tok, "_tok")
        .withColumn("_pos", F.row_number().over(w_doc))
        .withColumn("_sz", F.count("*").over(Window.partitionBy("_id")))
    ).persist()
    prefix = sized.filter(
        F.col("_pos") <= F.col("_sz") - F.ceil(F.lit(tau) * F.col("_sz")) + 1
    ).select(F.col("_tok"), F.col("_id").alias("_ida"), F.col("_sz").alias("_sza"))
    full = sized.select(
        F.col("_tok"), F.col("_id").alias("_idb"), F.col("_sz").alias("_szb")
    )
    cand = (
        prefix.join(full, "_tok")
        .filter(F.col("_ida") != F.col("_idb"))
        .filter(F.col("_szb").cast("double") >= F.lit(tau) * F.col("_sza").cast("double"))
        .select("_ida", "_idb")
        .distinct()
    )
    sets = base.select(F.col("_id"), F.sort_array("_ts").alias("_set")).persist()
    sa = sets.select(
        F.col("_id").alias("_ida"),
        F.col("_set").alias("_seta"),
        F.size("_set").alias("_na"),
    )
    sb = sets.select(F.col("_id").alias("_idb"), F.col("_set").alias("_setb"))
    inter = F.size(F.array_intersect("_seta", "_setb"))
    verified = (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .withColumn("inter", inter)
        .withColumn(
            "containment", F.col("inter").cast("double") / F.col("_na").cast("double")
        )
        .filter(F.col("containment") >= F.lit(tau))
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            F.col("inter").cast("long").alias("inter"),
            F.col("_na").cast("long").alias("size_a"),
            F.col("containment"),
        )
    )
    return tie(verified, sized, sets)
