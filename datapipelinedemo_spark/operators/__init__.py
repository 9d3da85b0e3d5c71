"""Composable DataFrame operators.

- ``aggregates`` — the reference's four aggregation pipelines (A1–A4)
  as partial-agg-friendly groupBy plans, plus the explicit-values pivot.
- ``pairs``      — intra-row ordered pair expansion (F16) via posexplode
  self-join, AQE-skew-aware.
- ``asof``       — as-of (most-recent-match) joins.
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard and
  embedding-cosine near-duplicate detection.
- ``similarity`` — brute-force and LSH-bucketed cosine top-k search.
- ``topk``       — window-based per-group top-k.
"""
