"""Distributed connected components — the alternating large-star/small-star
algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
Components in MapReduce and Beyond", SoCC 2014).

Why not plain min-label propagation: propagation needs O(component diameter)
rounds — a 10^6-node chain of pairwise near-duplicates (think: a crawl of
incrementally-edited boilerplate) takes 10^6 shuffles. The star operations
contract the graph toward a star forest around each component's minimum node
in O(log n) rounds regardless of diameter.

Both operations are expressed as joins + aggregations (never a per-node
collect_list, so a hub node's neighborhood is never materialized in one row):

  large-star: key every edge by BOTH endpoints; per key u compute
      m = min(neighborhood ∪ {u}) (a groupBy().min() joined back);
      emit (v, m) for neighbors v > u.
  small-star: key each edge by its LARGER endpoint k with w = smaller;
      per key m = min(smaller neighbors); emit (w, m) for w != m plus (k, m).

The edge set is a fixed point exactly when it is a star forest rooted at
component minima; convergence is detected with an order-insensitive
(count, xor-hash) signature, so the check is one tiny aggregate per round.
Every step is min-based and therefore deterministic — the final labels are
exactly "component = minimum member id", the same labels min-propagation
produces (tests/test_graph.py asserts equality against a Python union-find
on random graphs, and that a 300-node path converges in O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h")
    ).collect()[0]
    return int(row.n), int(row.h)


def _large_star(edges: DataFrame) -> DataFrame:
    both = edges.union(edges.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
    mins = (both.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m")))
    return (both.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    kw = edges.select(F.greatest("src", "dst").alias("k"),
                      F.least("src", "dst").alias("w"))
    mins = kw.groupBy("k").agg(F.min("w").alias("m"))
    j = kw.join(mins, "k")
    out = (j.filter(F.col("w") != F.col("m"))
           .select(F.col("w").alias("src"), F.col("m").alias("dst"))
           .union(mins.select(F.col("k").alias("src"), F.col("m").alias("dst"))))
    return out.distinct()


def connected_components(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """(src, dst) integer edge pairs -> (id, component) with component = the
    minimum node id of the component. Isolated nodes (absent from `edges`)
    are naturally absent from the output. Raises if the star forest has not
    stabilized within max_rounds (2*log2(n) rounds suffice per the paper, so
    40 covers graphs beyond 2^20 nodes with margin)."""
    # localCheckpoint (not persist): each round's plan builds on the last, so
    # lineage must be TRUNCATED or the analyzer's tree blows up exponentially
    # after a handful of rounds
    e = (edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
         .filter(F.col("src") != F.col("dst")).distinct()
         .localCheckpoint(eager=True))
    sig = _signature(e)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        nsig = _signature(nxt)
        e = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(f"connected_components: no fixed point in "
                           f"{max_rounds} rounds")
    # converged star forest: every edge is (member, component_min)
    labels = (e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
              .union(e.select(F.col("dst").alias("id"),
                              F.col("dst").alias("component")))
              .distinct())
    # do NOT unpersist e here: labels is lazy and localCheckpoint truncated
    # its lineage — the checkpointed blocks are released when e is GC'd
    return labels


def components_rounds(edges: DataFrame, max_rounds: int = 40) -> int:
    """Instrumented variant for tests: number of star rounds until fixpoint."""
    e = (edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
         .filter(F.col("src") != F.col("dst")).distinct()
         .localCheckpoint(eager=True))
    sig = _signature(e)
    for i in range(1, max_rounds + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        nsig = _signature(e)
        if nsig == sig:
            return i
        sig = nsig
    raise RuntimeError("no fixed point")
