"""Edit-distance-1 similarity self-join via symmetric-delete blocking.

The all-pairs formulation of "which strings are within one edit of
each other" is O(n^2) string comparisons — dead at 10^9 rows. The
SymSpell / FastSS observation makes it a plain equi-join:

    lev(a, b) <= 1  implies  D(a) ∩ D(b) != ∅

where D(s) = {s} ∪ {s with one character deleted}. Proof by case:
equal strings share s itself; an insertion/deletion pair means the
longer side's deletion neighborhood contains the shorter string; a
substitution x·S·y vs x·T·y means both sides' neighborhoods contain
x·y (delete position |x| from each). The implication is one-way —
e.g. "ab"/"ba" share deletion variants but sit at distance 2 — so
bucket collisions are CANDIDATES and every pair is re-verified with
the exact JVM-side ``levenshtein`` before it is emitted (zero false
positives, and the blocking property above guarantees zero false
negatives; both pinned in pytest).

Execution shape (the one you'd want at 100 TB):

- variant generation is pure Catalyst — a ``transform(sequence(...))``
  higher-order function builds the |s|+1 deletion keys inside
  whole-stage codegen, no Python anywhere;
- ONE shuffle of short (variant, id, s) rows; bucket sizes are bounded
  by how many corpus strings can reach the same variant by one edit
  (for distinct strings this is small — ~alphabet x |s| at worst),
  never by corpus size;
- candidate pairs are ``distinct``-ed BEFORE the levenshtein verify so
  a pair colliding in many buckets is verified once;
- the exploded frame is persisted and tied to the result
  (operators/cache.tie) because the self-join references it twice —
  without the persist, Spark rescans + re-explodes the input per side.

Strings with massive exact-duplicate groups should go through
``dedup.exact_dedup`` first: a group of d identical strings owns
d·(d-1)/2 output pairs by definition, and no blocking scheme can beat
its own output size.

Reference parity: the reference (/root/reference, Rust) is a Bloom
filter library with no string-similarity surface; this operator is
pipeline breadth for the engine (title/URL/name near-dup at crawl
scale), built on the same zero-false-negative discipline as the
sketches (mod.rs:199-228's containment contract is the spiritual
ancestor: candidates may over-approximate, emitted results never).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def deletion_variants(col: str) -> F.Column:
    """{s} ∪ {s minus one character}, as an array column — pure
    Catalyst (transform over sequence(1, length(s)), codegen-friendly).
    Distinct variants only (duplicate deletions of a repeated character
    collapse), so repeated-letter strings don't inflate the explode."""
    del1 = F.expr(
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i-1), "
        f"substring({col}, i+1, length({col}))))"
    )
    return F.array_distinct(F.concat(F.array(F.col(col)), del1))


def edit_distance_pairs(
    df: DataFrame,
    *,
    id_col: str,
    str_col: str,
    max_len: int | None = 256,
) -> DataFrame:
    """All (id_a, id_b, dist) pairs with levenshtein(s_a, s_b) <= 1 and
    id_a < id_b. Exact: symmetric-delete candidate generation (complete
    for distance <= 1) + JVM levenshtein verification (sound).

    ``max_len`` guards the explode fan-out: rows whose string exceeds
    it are dropped LOUDLY (ValueError at plan time if None would be
    unbounded is not possible — lengths are data — so the contract is:
    strings longer than max_len cannot participate; pass None to lift
    the guard). Long near-identical documents belong in the MinHash /
    span-dedup operators, not a per-character edit join.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
    if max_len is not None:
        base = base.filter(F.length("_s") <= max_len)

    exploded = base.select(
        "_id", "_s", F.explode(deletion_variants("_s")).alias("_k")
    ).persist()

    a = exploded.select(
        F.col("_k"),
        F.col("_id").alias("id_a"),
        F.col("_s").alias("s_a"),
    )
    b = exploded.select(
        F.col("_k").alias("_kb"),
        F.col("_id").alias("id_b"),
        F.col("_s").alias("s_b"),
    )
    cand = (
        a.join(b, (a["_k"] == b["_kb"]) & (a["id_a"] < b["id_b"]))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    out = cand.filter(F.levenshtein("s_a", "s_b") <= 1).select(
        "id_a",
        "id_b",
        F.levenshtein("s_a", "s_b").cast("long").alias("dist"),
    )
    return tie(out, exploded)
