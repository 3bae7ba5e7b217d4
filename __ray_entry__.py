"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Nothing here (or in the library) calls ray.init()/ray.shutdown(); only
bench.py, CLI scripts and the pytest fixture own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: all-kNN self-join (k=10)
    over points derived from the documents table, with neighbor payload
    re-attached by an equi-join afterwards — read -> map_batches (derive
    coords) -> cell+halo exchange -> vectorized sweep -> escalation ->
    merge -> payload join (see parallelspatialquery_ray.stages.knn/join)."""
    from parallelspatialquery_ray.pipelines.queries import q_knn_payload
    return q_knn_payload("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data operators (dedup / similarity / text / media /
    windows).  Each callable takes ``sf_dir`` and returns a Dataset /
    pandas DataFrame / pyarrow Table."""
    from parallelspatialquery_ray.pipelines.queries import build_queries
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names, bit-equal
    values) for every SQL-expressible query — 176 of 180, incl. the
    hash/sketch family (MinHash pair set, near-dup clusters, SimHash,
    fingerprint, LSH ANN with inlined hyperplanes, HLL cardinality — all
    via exact SQL twins of the engine's splitmix64/polynomial hashing),
    the spatial join family (rect overlap, segment crossing, polygon
    overlay, skyline, mutual-kNN), the geometry family (convex hulls,
    diameter, closest pair, areas, Hilbert/geohash keys) and the graph
    family (triangles, components, BFS, link prediction — recursive-CTE
    twins);
    only ann_ivf (iterated centroids), media (binary codecs) and
    knn_scale (full cross join, gated via its knn_scale_sampled twin)
    fall back to the rows-only check."""
    from parallelspatialquery_ray.pipelines.queries import build_oracle_sql
    return build_oracle_sql()
