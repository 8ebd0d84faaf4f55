"""Token dispersion across corpus slices (Gries' DP) + concentration.

Corpus-linguistics dispersion (Gries 2008, "Dispersions and adjusted
frequencies in corpora"): frequency alone misrepresents a token that
is frequent only because ONE source spams it. For token t with
per-source counts c_ts (source totals n_s, corpus total N, token
total C_t):

    DP_t = 0.5 * sum_s | c_ts / C_t  -  n_s / N |

DP = 0 when the token is spread across sources exactly proportionally
to their sizes; DP -> 1 as it concentrates into one vanishing slice.
The per-TOKEN complement of the per-SLICE statistics already in the
library (q_source_token_drift's KL is "how odd is this source";
keyness G2 is "which terms mark this slice"; DP is "how bursty is
this term corpus-wide") — the screen that separates genuine
vocabulary from boilerplate/spam markers before mixture tuning.

Absent sources are folded ANALYTICALLY (the benford.py trick): a
source with c_ts = 0 contributes |0 - w_s| = w_s, so

    DP_t = 0.5 + 0.5 * sum_{s: c_ts > 0} ( |c_ts/C_t - w_s| - w_s )

— no (token x source) grid join, the aggregate only touches observed
pairs. Also emitted per token:

    eff_sources = 1 / sum_s (c_ts / C_t)^2      (inverse Simpson —
                  "how many sources does this token effectively
                  live in"; 1 = one source, |S| = perfectly even)
    top_source / top_share — the dominant source (deterministic
                  tie-break: highest count, then lexicographically
                  first source) and its share of the token's mass.

Scale shape: ONE corpus-sized map-side-combinable (source, token)
aggregate; everything downstream is bounded by vocab x sources —
source totals (|S| rows) and the corpus total (1 row) broadcast, the
dominant-source pick is a window over the vocab-bounded count frame.
The count frame feeds three consumers (per-token aggregate, source
totals, dominant-source window), so it is persisted and tied to the
result per the cache lifecycle.

Reference parity: dispersion extends /root/reference (membership
library) per SURVEY §2.2's aggregation category; formulas per the
public literature cited above, mirrored exactly by the DuckDB oracle
(contract.q_token_dispersion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import tie


def token_dispersion(
    seq: DataFrame,
    group_col: str = "source",
    tokens_col: str = "tokens",
    min_total: int = 10,
) -> DataFrame:
    """(tok, total, n_sources, top_source, top_share, dp, eff_sources)
    for every token with corpus frequency >= min_total (the integer
    cut keeps the row set bitwise-reproducible across engines)."""
    sc = (
        seq.select(F.col(group_col).alias("src"), F.explode(tokens_col).alias("tok"))
        .groupBy("src", "tok")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    src_tot = sc.groupBy("src").agg(F.sum("c").cast("bigint").alias("n_s"))
    n_row = src_tot.agg(F.sum("n_s").cast("bigint").alias("n"))
    top = (
        sc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("tok").orderBy(F.desc("c"), "src")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("tok", F.col("src").alias("top_source"), F.col("c").alias("top_c"))
    )
    share = F.col("c").cast("double") / F.col("total")
    w_s = F.col("n_s").cast("double") / F.col("n")
    per_tok = (
        sc.join(F.broadcast(src_tot), "src")
        .crossJoin(F.broadcast(n_row))
        .withColumn("total", F.sum("c").over(Window.partitionBy("tok")).cast("bigint"))
        .filter(F.col("total") >= min_total)
        .groupBy("tok", "total")
        .agg(
            F.count("*").alias("n_sources"),
            F.round(
                0.5 + 0.5 * F.sum(F.abs(share - w_s) - w_s), 6
            ).alias("dp"),
            F.round(1.0 / F.sum(share * share), 6).alias("eff_sources"),
        )
    )
    out = per_tok.join(top, "tok").select(
        "tok",
        "total",
        "n_sources",
        "top_source",
        F.round(F.col("top_c").cast("double") / F.col("total"), 6).alias("top_share"),
        "dp",
        "eff_sources",
    )
    return tie(out, sc)


def source_cosine_pairs(
    seq: DataFrame,
    group_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Pairwise cosine similarity between the groups' unigram count
    vectors — "which feeds are near-copies of each other", the
    group-level complement of the per-token DP above and the
    per-group-vs-corpus KL (q_source_token_drift): two crawls of the
    same site show up as a cosine ~1 pair long before any document
    pair is inspected.

    Exactness: dot products and squared norms are sums of BIGINT count
    products (exact in both engines); only the final
    dot / (sqrt(na) * sqrt(nb)) touches floats — one double expression,
    rounded to 6 dp.

    Scale shape: ONE corpus-sized (group, token) aggregate (persisted
    + tied — it feeds the norms and both join sides); the pair join is
    an inverted-index equi-join on token over the vocab-bounded count
    frame (per-token fan-out C(|groups_t|, 2) — groups are feeds, a
    bounded set, so this is |vocab| x |S|^2 at worst, corpus-size-
    independent); norms broadcast onto the |S|^2-row result.
    """
    sc = (
        seq.select(F.col(group_col).alias("src"), F.explode(tokens_col).alias("tok"))
        .groupBy("src", "tok")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    norms = sc.groupBy("src").agg(F.sum(F.col("c") * F.col("c")).alias("nn"))
    dots = (
        sc.alias("a")
        .join(sc.alias("b"), "tok")
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
            F.count("*").alias("shared_tokens"),
        )
    )
    out = (
        dots.join(
            F.broadcast(norms.withColumnRenamed("src", "src_a")), "src_a"
        )
        .withColumnRenamed("nn", "nn_a")
        .join(F.broadcast(norms.withColumnRenamed("src", "src_b")), "src_b")
        .withColumnRenamed("nn", "nn_b")
        .select(
            "src_a",
            "src_b",
            "shared_tokens",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("nn_a").cast("double")) * F.sqrt(F.col("nn_b").cast("double"))),
                6,
            ).alias("cosine"),
        )
    )
    return tie(out, sc)
