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


def test_color_classes_conflict_free_and_complete():
    """Greedy coloring schedule (parallel/run.py): every target appears in
    exactly one class, and no class contains two conflicting sources."""
    import numpy as np

    from celeste_jl_tpu.parallel.run import color_classes

    rng = np.random.default_rng(5)
    # random geometric conflict graph incl. a long chain
    n = 60
    nb = {i: [] for i in range(n)}
    for i in range(24):          # chain 0-1-2-...-24
        nb[i].append(i + 1)
        nb[i + 1].append(i)
    for _ in range(40):          # random extra conflicts
        a, b = rng.integers(0, n, 2)
        if a != b and b not in nb[a]:
            nb[a].append(b)
            nb[b].append(a)

    classes = color_classes(list(range(n)), nb, rng=np.random.default_rng(0))
    seen = [s for cls in classes for s in cls]
    assert sorted(seen) == list(range(n))
    for cls in classes:
        cset = set(cls)
        for s in cls:
            assert not (cset & set(nb[s]) - {s}), (s, cls)
    # a chain of length 25 needs only 2 colors, not 25 waves
    assert len(classes) <= max(len(v) for v in nb.values()) + 1


def test_color_classes_widest_first():
    from celeste_jl_tpu.parallel.run import color_classes
    import numpy as np

    nb = {i: [] for i in range(10)}
    nb[0] = [1]
    nb[1] = [0]
    classes = color_classes(list(range(10)), nb,
                            rng=np.random.default_rng(0))
    assert len(classes[0]) >= len(classes[-1])


def test_fused_color_classes_cost_model():
    """The fused packer (measured linear lane-step cost model,
    k * sum_t W_t * lane_step_cost(t)) must return conflict-free classes
    covering every target once, at the minimal feasible class count for
    this graph (k = 3, the triangles' chromatic number — growing k only
    adds padded lane-steps), with per-(class, tile) group sizes within the
    padded widths the cost model charged for."""
    import numpy as np

    from celeste_jl_tpu.parallel.run import _next_pow2, fused_color_classes

    n = 80
    tile = {i: (32 if i < 50 else 64) for i in range(n)}
    nb = {i: [] for i in range(n)}
    for i in range(0, 40, 2):     # 20 conflicting pairs in the 32 bucket
        nb[i].append(i + 1)
        nb[i + 1].append(i)
    for i in range(50, 59, 3):    # 3 triangles in the 64 bucket
        for a in (i, i + 1, i + 2):
            for b in (i, i + 1, i + 2):
                if a != b:
                    nb[a].append(b)
    nb[49].append(52)             # one cross-tile conflict
    nb[52].append(49)

    classes = fused_color_classes(list(range(n)), nb,
                                  rng=np.random.default_rng(0), tile=tile)
    seen = sorted(s for cls in classes for s in cls)
    assert seen == list(range(n))
    for cls in classes:
        cset = set(cls)
        for s in cls:
            assert not (cset & set(nb[s]))             # conflict-free
    assert len(classes) == 3                           # chromatic number
    # group sizes stay within each bucket's padded width at k = 3
    for cls in classes:
        for t in (32, 64):
            n_t = sum(1 for s in cls if tile[s] == t)
            assert n_t <= max(32, _next_pow2(-(-sum(
                1 for s in range(n) if tile[s] == t) // 3)))
