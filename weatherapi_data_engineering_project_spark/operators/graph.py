"""Fixed-round graph centrality over edge lists (engine extension).

PageRank with a FIXED iteration count — the same contract that makes
the label-propagation clustering (operators/dedup.py) and the Lloyd
trainers (operators/similarity.py) SQL-expressible: a fixed number of
rounds unrolls into oracle CTEs.

Scale shape (100 TB story): each round is ONE partial-agg shuffle
keyed by destination node — contributions are computed row-locally on
the edges (rank/out-degree in double, IEEE-identical on any engine),
accumulated per destination in decimal (exact, partitioning-
independent), then pushed through a float32 round-trip. The round-trip
is the cross-engine re-synchronization trick from the k-means oracle:
casting a double to decimal(38,25) is NOT identical across engines
(Spark goes via the shortest string repr, DuckDB via the exact binary
value — they differ from digit ~18), so per-round sums agree only to
~1e-16 relative; snapping each round's ranks onto the float32 grid
(~1e-7 spacing) swallows that noise before it can compound, and both
engines enter the next round with bit-identical state.

Per-round localCheckpoint keeps the iterated plan flat (the q47
convention — lazy lineage doubles per round and eventually OOMs
analysis itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import checkpoint_tracked, persist_tracked

_DEC = "decimal(38,25)"


def pagerank_fixed(
    edges: DataFrame,
    n_rounds: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list, run for a FIXED n_rounds.

    Requires every node to appear as a destination (true for the
    bidirectional graphs this engine builds — each undirected edge is
    emitted in both directions, so there are no dangling sinks and no
    rank leaks). Returns (node, rank) with rank the raw double after
    the final round's float32 snap.

    rank_{i+1}(v) = (1-d)/N + d * SUM_{u->v} rank_i(u) / outdeg(u),
    every rank snapped to float32 after each round (see module
    docstring for why).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = persist_tracked(e.join(outdeg, "src"))
    nodes = persist_tracked(e.select(F.col("src").alias("node")).distinct())
    n = nodes.count()  # bounded driver scalar (node count)
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_rounds):
        contrib = ed.join(
            ranks, ed.src == ranks.node
        ).select(
            F.col("dst"),
            (F.col("rank") / F.col("outdeg")).cast(_DEC).alias("c"),
        )
        ranks = contrib.groupBy("dst").agg(F.sum("c").alias("s")).select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("s").cast("double"))
            .cast("float")
            .cast("double")
            .alias("rank"),
        )
        # checkpoint=False keeps the (fixed-round, still-shallow) lazy
        # plan inspectable for the plan-shape regression tests
        if checkpoint:
            ranks = checkpoint_tracked(ranks)
    return ranks
