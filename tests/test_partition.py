"""Cyclades partition correctness on a 4x4 grid conflict graph
(mirrors test_partition.jl:1-94)."""

import numpy as np

from celeste_jl_tpu.parallel.partition import (
    choose_batch_size_auto, connected_components, load_balance_across_threads,
    partition_cyclades, partition_cyclades_dynamic, partition_equally)


def grid_conflict_graph(n=4):
    """Sources on an n x n grid; adjacent (4-neighborhood) sources conflict."""
    ids = list(range(n * n))
    nm = {i: [] for i in ids}
    for i in range(n):
        for j in range(n):
            s = i * n + j
            for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                ii, jj = i + di, j + dj
                if 0 <= ii < n and 0 <= jj < n:
                    nm[s].append(ii * n + jj)
    return ids, nm


def test_all_sources_assigned_exactly_once():
    ids, nm = grid_conflict_graph(4)
    batches = partition_cyclades_dynamic(ids, nm, batch_size=6)
    seen = [s for comps in batches for comp in comps for s in comp]
    assert sorted(seen) == ids


def test_no_conflicts_between_components_within_batch():
    ids, nm = grid_conflict_graph(4)
    batches = partition_cyclades_dynamic(ids, nm, batch_size=6)
    for comps in batches:
        for a in range(len(comps)):
            for b in range(a + 1, len(comps)):
                for s in comps[a]:
                    for t in comps[b]:
                        assert t not in nm[s], (s, t)


def test_static_partition_covers_all():
    ids, nm = grid_conflict_graph(4)
    assignment = partition_cyclades(3, ids, nm, batch_size=6)
    seen = [s for th in assignment for b in th for s in b]
    assert sorted(seen) == ids


def test_partition_equally():
    out = partition_equally(3, 10)
    seen = [s for th in out for b in th for s in b]
    assert sorted(seen) == list(range(10))


def test_connected_components_chain():
    nm = {0: [1], 1: [0, 2], 2: [1], 3: []}
    comps = connected_components([0, 1, 2, 3], nm)
    sizes = sorted(len(c) for c in comps)
    assert sizes == [1, 3]


def test_load_balance():
    assignment, imb = load_balance_across_threads(2, [5, 5, 5, 5])
    assert imb == 1.0
    lens = sorted(len(a) for a in assignment)
    assert lens == [2, 2]


def test_choose_batch_size_runs():
    ids, nm = grid_conflict_graph(4)
    bs = choose_batch_size_auto(ids, nm, np.ones(16), 4)
    assert bs in (40, 60, 80, 120, 200)
