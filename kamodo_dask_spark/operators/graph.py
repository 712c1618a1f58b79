"""Link-analysis operators over edge relations.

The clustering stack already walks graphs for CONNECTIVITY
(``dedup.py::connected_components``: hash-min propagation); this module
adds IMPORTANCE — PageRank (Page et al. 1999) over an arbitrary edge
relation, the ranking pass of reference-graph curation (which documents
does everything else cite/duplicate/link to?) and the classic
iterative-algebra workload a 100 TB engine must express without a graph
framework.

Design mirrors the deterministic-trajectory fit operators
(``similarity.py::kmeans_fit``/``pca_power_iteration``): every per-node
rank is ROUNDED in-engine each iteration, so the whole trajectory is
reproducible across engines/cluster sizes and a relational oracle can
unroll the iterations and hash-check every final rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 6,
) -> DataFrame:
    """PageRank over a directed edge relation, deterministic end to end.

    Standard formulation with uniform teleport and DANGLING-mass
    redistribution: nodes = distinct endpoints; ``pr0 = round(1/N, r)``;
    per iteration ``pr(v) = round((1-d)/N + d·(Σ_{u→v} pr(u)/out(u) +
    dangling/N), r)`` where ``dangling = round(Σ pr(u) over out(u)=0, r)``
    — without the dangling term a sink would silently leak rank mass and
    the result would depend on how many sinks the edge sample happens to
    contain.

    100 TB shape: the node and out-degree relations are built once and
    checkpointed (edge-sized aggregations, one hash shuffle each). Each
    iteration is one join of the rank relation to the edge relation on the
    source (hash-uniform — both sides keyed by node id) followed by a
    partial-combined sum keyed on the destination, plus a LEFT join back
    to the node relation to re-admit zero-in-degree nodes; the dangling
    mass is a single driver-collected scalar per round (metadata-sized,
    the ``kmeans_fit`` discipline). Per-iteration rounding pins the
    trajectory cross-engine. Rank state is one row per node, never
    materialized driver-side.

    Returns ``(node, pr)``. Multi-edges count once per occurrence (each
    parallel edge carries its share) — deduplicate upstream if the input
    may repeat.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pr")).limit(0)
    out_deg = e.groupBy(F.col("_src").alias("node")).agg(
        F.count("*").alias("_out")
    )
    # ranks ⟕ out-degree, carried through every iteration (out(u) = 0 for
    # dangling nodes; NULL after the left join → flagged, not divided by)
    state = (
        nodes.join(out_deg, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("_out"), F.lit(0)).alias("_out"),
            F.round(F.lit(1.0 / n), round_digits).alias("pr"),
        )
        .localCheckpoint(eager=True)
    )
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        dangling = (
            state.filter(F.col("_out") == 0)
            .agg(F.round(F.coalesce(F.sum("pr"), F.lit(0.0)), round_digits))
            .first()[0]  # 1-row scalar (metadata-sized)
        )
        contrib = (
            state.filter(F.col("_out") > 0)
            .join(e, state["node"] == e["_src"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("_out")).alias("_in"))
        )
        state = (
            state.select("node", "_out")
            .join(contrib, "node", "left")
            .select(
                "node",
                "_out",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.lit(float(dangling) / n)
                    ),
                    round_digits,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("node", "pr")
