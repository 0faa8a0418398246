"""Greedy histogram clustering for context maps.

Reference: lib/jxl/enc_cluster.{h,cc} ClusterHistograms — entropy-cost
driven agglomerative clustering with kClustersLimit. Exact clustering is
encoder freedom (not bitstream-visible); this implementation merges the
pair with the smallest entropy-cost increase until the limit holds and
no merge saves bits.
"""

from __future__ import annotations

import heapq

import numpy as np


def _entropy_cost(counts: np.ndarray) -> float:
    total = counts.sum()
    if total == 0:
        return 0.0
    nz = counts[counts > 0].astype(np.float64)
    return float(total * np.log2(total) - np.sum(nz * np.log2(nz)))


def cluster_histograms(histograms: list[np.ndarray], max_clusters: int = 64,
                       ) -> tuple[list[int], list[np.ndarray]]:
    """Returns (context_map, clustered_histograms)."""
    n = len(histograms)
    parents = list(range(n))
    counts = [h.astype(np.int64).copy() for h in histograms]
    costs = [_entropy_cost(c) for c in counts]
    alive = [True] * n

    # Merge empty histograms into the first nonempty (free merges).
    empties = [i for i in range(n) if counts[i].sum() == 0]
    nonempty = [i for i in range(n) if counts[i].sum() > 0]
    if nonempty:
        target = nonempty[0]
        for e in empties:
            parents[e] = target
            alive[e] = False

    live = [i for i in range(n) if alive[i]]

    def merge_cost(i: int, j: int) -> float:
        return _entropy_cost(counts[i] + counts[j]) - costs[i] - costs[j]

    heap: list[tuple[float, int, int]] = []
    for ai in range(len(live)):
        for aj in range(ai + 1, len(live)):
            i, j = live[ai], live[aj]
            heapq.heappush(heap, (merge_cost(i, j), i, j))

    num_live = len(live)
    while num_live > 1 and heap:
        cost, i, j = heapq.heappop(heap)
        if not (alive[i] and alive[j]):
            continue
        # Merge while over the limit, or when merging saves bits
        # (40-bit histogram-header overhead heuristic).
        if num_live <= max_clusters and cost > 40:
            break
        counts[i] = counts[i] + counts[j]
        costs[i] = _entropy_cost(counts[i])
        alive[j] = False
        parents[j] = i
        num_live -= 1
        for k in range(n):
            if alive[k] and k != i:
                a, b = (i, k) if i < k else (k, i)
                heapq.heappush(heap, (merge_cost(a, b), a, b))

    def find(i: int) -> int:
        while parents[i] != i:
            parents[i] = parents[parents[i]]
            i = parents[i]
        return i

    roots: list[int] = []
    root_index: dict[int, int] = {}
    context_map = []
    for i in range(n):
        r = find(i)
        if r not in root_index:
            root_index[r] = len(roots)
            roots.append(r)
        context_map.append(root_index[r])
    clustered = [counts[r] for r in roots]
    return context_map, clustered
