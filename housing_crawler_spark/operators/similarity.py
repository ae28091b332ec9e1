"""Iterative similarity search with threshold relaxation (SURVEY F11).

The reference finds "similar ads" by widening/narrowing a search box
over a 5x4x6 grid of (distance, ±price%, recency-days) thresholds until
3-10 rows match (app.py:1236-1270,1750-1785). The distributed form:
cache the candidate table once, then iterate cheap filters driver-side
— each probe is a codegen'd predicate over the cached DataFrame, so the
loop costs one in-memory scan per step, no recomputation, no shuffle.

Also hosts the embedding-space variant used by queries_ml (fixed-radius
widening over cosine distance)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RelaxationResult:
    df: DataFrame
    n: int
    step: int  # grid index that satisfied the bounds (-1 = fell through)


def iterative_relaxation(
    candidates: DataFrame,
    predicate_for: "callable[[tuple], Column]",
    grid: list[tuple],
    min_rows: int = 3,
    max_rows: int = 10,
) -> RelaxationResult:
    """Walk ``grid`` (loosest-last) and return the first threshold tuple
    whose filtered count lands in [min_rows, max_rows]; if none does,
    return the closest-from-above, else the loosest."""
    cached = candidates.cache()
    try:
        best: tuple[int, int, DataFrame] | None = None  # (n, step, df)
        for step, params in enumerate(grid):
            df = cached.filter(predicate_for(params))
            n = df.count()
            if min_rows <= n <= max_rows:
                return RelaxationResult(df, n, step)
            if n > max_rows and (best is None or n < best[0]):
                best = (n, step, df)
        if best is not None:
            return RelaxationResult(best[2], best[0], -1)
        df = cached.filter(predicate_for(grid[-1]))
        return RelaxationResult(df, df.count(), -1)
    finally:
        cached.unpersist()


def price_distance_recency_grid(
    box_sizes=(0.5, 1.0, 2.0, 4.0, 8.0),
    price_pcts=(0.10, 0.20, 0.35, 0.50),
    recency_days=(7, 14, 30, 60, 120, 365),
) -> list[tuple]:
    """The reference's 5x4x6 widening grid, tightest-first
    (app.py:1236-1270)."""
    return [
        (b, p, d) for d in recency_days for p in price_pcts for b in box_sizes
    ]


def box_predicate(
    lat_col: str,
    lon_col: str,
    price_col: str,
    ts_col: str,
    probe_lat: float,
    probe_lon: float,
    probe_price: float,
    now: str,
):
    """Builds predicate_for() for the housing-style search: geodesic box
    (meters→degrees cos-corrected, reference utils.py:1039-1053), ±price
    window, recency cutoff."""
    import math

    def pred(params) -> Column:
        box_km, price_pct, days = params
        dlat = box_km / 111.0
        dlon = box_km / (111.0 * max(0.1, math.cos(math.radians(probe_lat))))
        return (
            F.col(lat_col).between(probe_lat - dlat, probe_lat + dlat)
            & F.col(lon_col).between(probe_lon - dlon, probe_lon + dlon)
            & F.col(price_col).between(
                probe_price * (1 - price_pct), probe_price * (1 + price_pct)
            )
            & (F.col(ts_col) >= F.date_sub(F.lit(now).cast("date"), days))
        )

    return pred
