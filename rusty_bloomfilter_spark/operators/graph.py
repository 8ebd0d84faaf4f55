"""PageRank by relational power iteration.

Each iteration is two shuffles expressed as plain DataFrame ops —
contributions = edges ⋈ ranks grouped by destination, then the damped
update left-joined back onto the node set so zero-in-degree nodes keep
their (1-d)/N base instead of silently vanishing:

    r'(v) = (1-d)/N + d * Σ_{u->v} r(u)/outdeg(u)

Design points, all load-bearing at scale:

- the (src, dst, outdeg) edge frame is the big invariant input: it is
  computed once, hash-partitioned by ``src`` and persisted, so each
  iteration reshuffles only the NODE-sized rank frame to meet it —
  never the edge list;
- ranks are ``localCheckpoint(eager=True)`` every round: iterative
  DataFrame loops grow the logical plan per iteration and the driver
  dies near round 10 without truncation even on toy graphs (measured
  round 3 — see operators/cluster.py, same discipline);
- dangling nodes (no out-edges) LEAK their damped mass — the "leaky"
  formulation — rather than paying a global redistribution aggregate
  per iteration; ranks then sum to < 1 in graphs with dangling nodes,
  which is documented, deterministic, and exactly what the SQL oracle
  computes. Symmetrize the edge list if you need a leak-free sum;
- multi-edges count multiply in both outdeg and contributions
  (multigraph semantics); ``.distinct()`` the edges first if you want
  simple-graph semantics.

Reference parity: the reference (/root/reference, Rust) has no graph
surface; this extends the engine's iterative-algorithm category
(connected components, cluster.py) with the canonical link-analysis
workload, under the same lineage-truncation rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tie


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks after ``iters`` damped power iterations from the uniform
    start: (v, r). One driver-side scalar (the node count N — it
    parameterizes the constant terms) and 2 shuffles per iteration."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    out_deg = e.groupBy("_src").agg(F.count("*").cast("double").alias("_outdeg"))
    # partition the invariant edge frame by the join key ONCE; every
    # iteration's edges ⋈ ranks then moves only node-sized rank rows
    edeg = e.join(out_deg, "_src").repartition("_src").persist()
    nodes = (
        e.select(F.col("_src").alias("v"))
        .union(e.select(F.col("_dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round; static plan
    )
    n = nodes.count()
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            edeg.join(ranks, edeg["_src"] == ranks["v"])
            .select(
                F.col("_dst").alias("v"),
                (F.col("r") / F.col("_outdeg")).alias("_c"),
            )
            .groupBy("v")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contribs, "v", "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # constant-size plan per round
        )
    return tie(ranks, edeg)


def pagerank_oracle_sql(
    edges_cte: str,
    *,
    iters: int = 5,
    damping: float = 0.85,
    round_digits: int = 6,
) -> str:
    """The matching ANSI-SQL formulation with the iteration UNROLLED
    into ``iters`` chained CTEs (portable — no recursive-aggregate
    support required). ``edges_cte`` must be a SELECT producing
    (src, dst). Emits (v, rank_scaled = r * N rounded) so the float
    rounding convention (round(…, 6)) keeps ~6 significant digits."""
    d = float(damping)
    parts = [
        f"edges AS ({edges_cte})",
        "outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg"
        " FROM edges GROUP BY 1)",
        "nodes AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "pr0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"pr{k} AS (SELECT nd.v AS v, "
            f"{1.0 - d} / (SELECT n FROM nn)"
            f" + {d} * coalesce(c.contrib, 0.0) AS r "
            "FROM nodes nd LEFT JOIN ("
            "SELECT e.dst AS v, sum(p.r / od.outdeg) AS contrib "
            f"FROM pr{k - 1} p "
            "JOIN edges e ON p.v = e.src "
            "JOIN outdeg od ON od.src = e.src "
            "GROUP BY e.dst) c ON nd.v = c.v)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT v, round(r * (SELECT n FROM nn), {round_digits})"
        f" AS rank_scaled FROM pr{iters}"
    )


def triangle_counts(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts -> (node, n_triangles);
    nodes in no triangle are absent. Input is an undirected edge list —
    self-loops drop, duplicates and reversed copies dedup.

    Degree-ordered orientation (the classic wedge-count bound): every
    canonical edge is directed from its lower endpoint under the total
    order (degree, node), so a node's out-degree is O(sqrt(m)) on any
    graph and the wedge self-join's fan-out is sum(outdeg^2) — the
    m^{3/2} triangle-enumeration bound — instead of sum(deg^2), which a
    high-degree hub would otherwise make quadratic. Each triangle is
    enumerated exactly once (its order-minimal apex owns it). The
    oriented edge frame is persisted (referenced three times: two wedge
    sides + the closing probe) and tied to the result's lifecycle."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_a"),
            F.greatest(F.col(src), F.col(dst)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    deg = (
        e.select(F.col("_a").alias("_v"))
        .unionAll(e.select(F.col("_b").alias("_v")))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    # orient by (degree, node) total order: lower endpoint -> higher
    keyed = (
        e.join(deg.withColumnRenamed("_v", "_a").withColumnRenamed("_d", "_da"), "_a")
        .join(deg.withColumnRenamed("_v", "_b").withColumnRenamed("_d", "_db"), "_b")
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("_a")).otherwise(F.col("_b")).alias("u"),
        F.when(a_first, F.col("_b")).otherwise(F.col("_a")).alias("v"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("dv"),
    ).persist()

    w1 = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    w2 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    # wedges (x, y) at apex u with ord(x) < ord(y); the closing edge is
    # then oriented x -> y by construction
    wedges = w1.join(w2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("u", "x", "y")

    counts = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tie(counts, oriented)
