"""Alternating large-star/small-star connected components (operators/graph.py)
vs a Python union-find, plus the O(log n)-rounds property that justifies it
over min-label propagation."""

import random

import pandas as pd
import pytest

from planetiler_spark.operators.graph import (components_rounds,
                                              connected_components)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    return {r.id: r.component for r in connected_components(df).collect()}


@pytest.mark.parametrize("n,m,seed", [(60, 40, 1), (120, 200, 2), (200, 90, 3)])
def test_matches_union_find_on_random_graphs(spark, n, m, seed):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    assert _run(spark, edges) == _union_find(nodes, edges)


def test_path_graph_converges_logarithmically(spark):
    """A 300-node path has diameter 299: min-label propagation would need 299
    rounds; the star rounds must land in O(log n)."""
    edges = [(i, i + 1) for i in range(299)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    rounds = components_rounds(df)
    assert rounds <= 14  # 2*log2(300) + slack; propagation would need 299
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(300)}


def test_multiple_components_and_orientation(spark):
    # mixed edge orientations, two components + a pair
    edges = [(5, 3), (3, 9), (9, 5), (20, 21), (40, 41), (41, 42), (42, 40)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 40: 40, 41: 40, 42: 40}
