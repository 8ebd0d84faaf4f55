"""Referential-integrity audit across table relationships.

The cross-TABLE half of data validation (operators/validate.py is the
single-table half): for each declared foreign-key relationship, how
many child rows point at a parent that doesn't exist (orphans), how
many leave the FK NULL (unset — NOT an orphan, per SQL semantics),
and how much of the parent key space the children actually reference
(coverage — a collapsing coverage is the classic symptom of a join
that silently started dropping a shard upstream).

Distributed shape per relationship:
- child keys collapse to DISTINCT first (map-side combined; the
  orphan probe shuffles key-cardinality rows, never child rows),
  carrying their row multiplicity so orphan ROW counts need no second
  corpus pass.
- orphan detection is a LEFT ANTI join of distinct child keys against
  distinct parent keys — exactly the shape operators/bloomjoin.py::
  bloom_anti_join accelerates at 100 TB (negative probes bypass; the
  filter broadcasts in O(bytes) when the parent keys can't). This
  module keeps the plain anti join: the frames it joins are already
  key-distinct, and the contract oracle needs the exact semantics.
- every emitted number is an exact integer or a round(6) ratio of
  exact integers — hash-matchable cross-engine.

Reference parity: beyond /root/reference (membership only); the scale
path for the anti join is the Bloom filter family the reference pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_audit(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Audit ``(name, child_df, child_key, parent_df, parent_key)``
    relationships; one output row per relationship:

    - ``n_child_rows`` / ``n_null_fk``: child rows total / FK-NULL
    - ``n_child_keys``: distinct non-NULL child key values
    - ``n_orphan_keys`` / ``n_orphan_rows``: keys (and the rows
      carrying them) with no matching parent
    - ``orphan_row_rate``: n_orphan_rows / (n_child_rows − n_null_fk)
    - ``n_parent_keys`` / ``parent_coverage``: distinct parent keys,
      and the referenced fraction of them

    A healthy snapshot has orphan counts 0 and stable coverage.
    """
    if not relationships:
        raise ValueError("need at least one relationship")
    names = [r[0] for r in relationships]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate relationship names in {names}")

    reports = []
    for name, child, ckey, parent, pkey in relationships:
        totals = child.agg(
            F.count("*").alias("n_child_rows"),
            F.sum(F.col(ckey).isNull().cast("long")).alias("n_null_fk"),
        )
        ckeys = (
            child.filter(F.col(ckey).isNotNull())
            .groupBy(F.col(ckey).alias("_k"))
            .agg(F.count("*").alias("_rows"))
        )
        # NULL parent keys are dropped: they can't match any probe, and
        # count-DISTINCT semantics must agree with SQL (which excludes
        # NULL) for the coverage denominator.
        pkeys = (
            parent.filter(F.col(pkey).isNotNull())
            .select(F.col(pkey).alias("_k"))
            .distinct()
        )
        orphans = ckeys.join(pkeys, "_k", "left_anti").agg(
            F.count("*").alias("n_orphan_keys"),
            F.coalesce(F.sum("_rows"), F.lit(0)).alias("n_orphan_rows"),
        )
        matched = ckeys.join(pkeys, "_k", "left_semi").agg(
            F.count("*").alias("_n_matched")
        )
        ck_agg = ckeys.agg(F.count("*").alias("n_child_keys"))
        pk_agg = pkeys.agg(F.count("*").alias("n_parent_keys"))
        row = (
            totals.crossJoin(ck_agg)
            .crossJoin(orphans)
            .crossJoin(matched)
            .crossJoin(pk_agg)
            .select(
                F.lit(name).alias("relationship"),
                "n_child_rows",
                "n_null_fk",
                "n_child_keys",
                "n_orphan_keys",
                "n_orphan_rows",
                F.when(
                    (F.col("n_child_rows") - F.col("n_null_fk")) > 0,
                    F.round(
                        F.col("n_orphan_rows").cast("double")
                        / (F.col("n_child_rows") - F.col("n_null_fk")),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("orphan_row_rate"),
                "n_parent_keys",
                F.when(
                    F.col("n_parent_keys") > 0,
                    F.round(
                        F.col("_n_matched").cast("double") / F.col("n_parent_keys"), 6
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("parent_coverage"),
            )
        )
        reports.append(row)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def fd_audit(
    df: DataFrame,
    pairs: "list[tuple[str, str]]",
) -> DataFrame:
    """Functional-dependency audit WITHIN one table — the intra-table
    complement of :func:`fk_audit`: for each candidate rule det → dep,
    does every determinant value map to exactly ONE dependent value?
    The schema-inference / denormalization-safety pass: a violated
    "obvious" FD (order → customer, nation → region) is the classic
    symptom of a bad upstream join fanning rows out, and a CONFIRMED
    FD is a license to normalize the column pair out of a wide 100-TB
    fact table.

    Per rule: ``n_det_values`` (distinct determinants),
    ``n_violating_dets`` (determinants mapping to >1 dependent),
    ``max_fanout`` (worst dependents-per-determinant), ``is_fd``.
    NULL determinants are excluded (SQL grouping would conflate them
    into a fake single value); NULL dependents count as a value of
    their own (det → sometimes-NULL is a real violation).

    Distributed shape per rule: one groupBy on the determinant over a
    two-column projection — the shuffle carries det-cardinality rows,
    map-side combined; rules are unioned, so the audit is |rules|
    bounded aggregates, each prunable to two columns at the scan.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    outs = []
    for det, dep in pairs:
        per_det = (
            df.filter(F.col(det).isNotNull())
            .groupBy(det)
            .agg(
                F.size(F.collect_set(F.struct(F.col(dep)))).alias("_fan")
            )
        )
        outs.append(
            per_det.agg(
                F.lit(f"{det} -> {dep}").alias("rule"),
                F.count("*").alias("n_det_values"),
                # coalesce: sum/max over ZERO determinants (all-NULL or
                # empty column) are SQL NULL — report 0 violations and
                # a vacuously-true FD with n_det_values = 0, never a
                # NULL verdict a boolean filter silently drops
                F.coalesce(
                    F.sum(F.when(F.col("_fan") > 1, 1).otherwise(0)), F.lit(0)
                ).alias("n_violating_dets"),
                F.coalesce(F.max("_fan"), F.lit(0)).cast("int").alias(
                    "max_fanout"
                ),
            )
        )
    unioned = outs[0]
    for o in outs[1:]:
        unioned = unioned.unionByName(o)
    return unioned.withColumn("is_fd", F.col("n_violating_dets") == 0)


def erasure_manifest(
    subjects: DataFrame,
    tables: "list[tuple[str, DataFrame, str]]",
) -> DataFrame:
    """Right-to-erasure IMPACT manifest: given the data-subject key
    list, how many rows (and distinct subjects) each table would lose
    — the report a deletion request generates BEFORE any rewrite runs
    (sizing, review, and the audit trail), and the relational
    companion to the sketch-side revocation flow
    (q_counting_bloom_revoke deletes from MEMBERSHIP state; this
    scopes the row deletes). For tables keyed indirectly (lineitem →
    orders → customer), pass a pre-joined frame with the subject key
    resolved.

    One scan per table: the subject list broadcasts (erasure batches
    are small by nature), a left-join mark feeds a single aggregate —
    affected rows, affected distinct subjects, and the table's total,
    so frac_rows needs no second pass. NULL keys never match (SQL
    join semantics — an unowned row is not erasable by any subject).
    """
    if not tables:
        raise ValueError("tables must be non-empty")
    subj = F.broadcast(
        subjects.select(F.col(subjects.columns[0]).alias("_s")).distinct()
    )
    outs = []
    for name, df, key_col in tables:
        marked = df.select(F.col(key_col).alias("_k")).join(
            subj.withColumn("_hit", F.lit(True)),
            on=F.col("_k") == F.col("_s"),
            how="left",
        )
        outs.append(
            marked.agg(
                F.lit(name).alias("table_name"),
                F.count("*").alias("n_rows_total"),
                F.coalesce(
                    F.sum(F.when(F.col("_hit"), 1).otherwise(0)), F.lit(0)
                ).alias("n_rows_affected"),
                F.countDistinct(F.when(F.col("_hit"), F.col("_k"))).alias(
                    "n_subjects_present"
                ),
                # try_divide: an EMPTY table's count(*) is 0 and ANSI
                # double/0 throws — an empty table loses nothing: 0.0
                F.coalesce(
                    F.round(
                        F.try_divide(
                            F.coalesce(
                                F.sum(F.when(F.col("_hit"), 1).otherwise(0)),
                                F.lit(0),
                            ),
                            F.count("*"),
                        ),
                        6,
                    ),
                    F.lit(0.0),
                ).alias("frac_rows"),
            )
        )
    unioned = outs[0]
    for o in outs[1:]:
        unioned = unioned.unionByName(o)
    return unioned
