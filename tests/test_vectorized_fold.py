"""Focused tests for the vectorized driver-side cluster fold.

``_min_label_components`` replaced the per-edge Python union-find inside
``dup_clusters`` / ``DedupIndex`` (r6 optimization). Its contract: every
node labeled with the MINIMUM id of its connected component — these tests
pin that against a reference union-find on randomized graphs (long and
string ids, duplicate edges, self-loops filtered upstream, edge-less
extra nodes), so any future change to the numpy kernel is caught without
paying a Spark session.
"""

from __future__ import annotations

import random

import numpy as np

from endor_blockchain_data_pipeline_spark.operators.dedup import (
    _min_label_components,
)


def _uf_reference(edges, nodes=()):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for n in nodes:
        find(n)
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_matches_union_find_randomized_long_ids():
    rng = random.Random(13)
    for _ in range(25):
        n = rng.randint(1, 1500)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(0, 3000))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        ref = _uf_reference(edges)
        u, lab = _min_label_components(
            np.array([a for a, _ in edges], dtype=np.int64),
            np.array([b for _, b in edges], dtype=np.int64),
        )
        assert dict(zip(u.tolist(), lab.tolist())) == ref


def test_matches_union_find_string_ids_and_duplicate_edges():
    rng = random.Random(29)
    edges = [
        (f"c{rng.randint(0, 200)}", f"c{rng.randint(0, 200)}")
        for _ in range(600)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edges += edges[:100]  # duplicates must not change labels
    ref = _uf_reference(edges)
    u, lab = _min_label_components(
        np.array([a for a, _ in edges], dtype=object),
        np.array([b for _, b in edges], dtype=object),
    )
    assert dict(zip(u.tolist(), lab.tolist())) == ref
    # string labels are lexicographic minima, like min() in the union-find
    assert all(l <= n for n, l in zip(u.tolist(), lab.tolist()))


def test_extra_nodes_label_themselves():
    # takedown shape: remaining members with no surviving edges must still
    # appear, labeled as their own singleton cluster
    u, lab = _min_label_components(
        np.array([1, 2], dtype=np.int64),
        np.array([2, 3], dtype=np.int64),
        extra_nodes=np.array([7, 9, 1], dtype=np.int64),
    )
    got = dict(zip(u.tolist(), lab.tolist()))
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 9}


def test_empty_inputs():
    u, lab = _min_label_components(
        np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    )
    assert len(u) == 0 and len(lab) == 0
    u, lab = _min_label_components(
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
        extra_nodes=np.array([5], dtype=np.int64),
    )
    assert dict(zip(u.tolist(), lab.tolist())) == {5: 5}
