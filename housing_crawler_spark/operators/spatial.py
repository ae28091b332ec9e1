"""Point-in-grid-cell spatial join (reference
ads_table_processing.py:659-671 ``gpd.sjoin(ads, grid)``).

Grid-bucket equi-join, not a geometric library: every cell is an
axis-aligned rectangle, so we hash both sides into coarse buckets the
size of the largest cell, broadcast the (small) expanded cell table,
equi-join on the bucket key and apply the exact containment predicate
as a join residual. One broadcast hash join, no shuffle of the fact
side beyond what the pipeline already has, scales linearly in ads.

``geometry`` controls the containment test:

- ``"rect"``   — honest rectangle containment (the engine's default for
  new data).
- ``"bowtie"`` — byte-faithful to the reference: its
  ``lat_lon_to_polygon`` (utils.py:937-946) emits the rectangle's
  vertices in bowtie order, so shapely's even-odd interior is TWO
  opposing triangles and ~half of each cell matches nothing (measured
  50.7% of the shipped month's rows carry NULL OSM features for exactly
  this reason). In normalized cell coordinates u=(lat-lat0)/Δlat,
  v=(lng-lng0)/Δlng the covered region is (v-u)(v+u-1) ≤ 0.

A point on a shared cell edge matches multiple cells (shapely
``intersects`` includes boundaries); like the reference — which keeps
sjoin duplicates until the final ``drop_duplicates(['id'])`` — the join
emits all matches plus ``grid_cell_idx`` so the caller's dedup picks
the first grid cell deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_feature_join(
    ads: DataFrame,
    grid: DataFrame,
    lat_col: str = "latitude",
    lng_col: str = "longitude",
    geometry: str = "bowtie",
    how: str = "left",
) -> DataFrame:
    # bucket size = the largest cell extent (two scalars off a dim table)
    ext = grid.agg(
        F.max(F.col("lat_end") - F.col("lat_start")).alias("h"),
        F.max(F.col("lng_end") - F.col("lng_start")).alias("w"),
    ).first()
    cell_h, cell_w = float(ext["h"]), float(ext["w"])

    cells = (
        grid.withColumn(
            "__by",
            F.explode(
                F.sequence(
                    F.floor(F.col("lat_start") / cell_h).cast("long"),
                    F.floor(F.col("lat_end") / cell_h).cast("long"),
                )
            ),
        )
        .withColumn(
            "__bx",
            F.explode(
                F.sequence(
                    F.floor(F.col("lng_start") / cell_w).cast("long"),
                    F.floor(F.col("lng_end") / cell_w).cast("long"),
                )
            ),
        )
    )

    lat, lng = F.col(lat_col), F.col(lng_col)
    pts = ads.withColumn("__by", F.floor(lat / cell_h).cast("long")).withColumn(
        "__bx", F.floor(lng / cell_w).cast("long")
    )

    in_bbox = (
        (lat >= F.col("lat_start"))
        & (lat <= F.col("lat_end"))
        & (lng >= F.col("lng_start"))
        & (lng <= F.col("lng_end"))
    )
    if geometry == "rect":
        contained = in_bbox
    elif geometry == "bowtie":
        u = (lat - F.col("lat_start")) / (F.col("lat_end") - F.col("lat_start"))
        v = (lng - F.col("lng_start")) / (F.col("lng_end") - F.col("lng_start"))
        contained = in_bbox & ((v - u) * (v + u - 1) <= 0)
    else:  # pragma: no cover
        raise ValueError(f"unknown geometry {geometry!r}")

    cond = (
        (pts["__by"] == cells["__by"]) & (pts["__bx"] == cells["__bx"]) & contained
    )
    joined = pts.join(F.broadcast(cells), cond, how)
    drop = [cells["__by"], cells["__bx"], pts["__by"], pts["__bx"]]
    out = joined.drop(*drop).drop("lat_start", "lat_end", "lng_start", "lng_end")
    return out
