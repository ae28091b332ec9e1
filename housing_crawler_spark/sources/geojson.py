"""GeoJSON grid-feature source (reference utils.py:948-968
``get_grid_polygons_all_cities`` / per-city ``*_grid_feats.geojson``).

The reference's 200 m grid cells are axis-aligned rectangles stored as
GeoJSON polygons whose vertices are ``(lat, lng)`` pairs (the reference
builds shapely Points as ``Point(lat, lng)`` — utils.py:941-945 — so the
GeoJSON x-axis IS latitude). Cell geometry therefore reduces to a
bounding box; ``operators.spatial`` handles the containment semantics.

Grids are dimension tables (10^3-10^5 cells per city), so parsing
happens driver-side with the stdlib json module and the rows become a
regular DataFrame — at cluster scale the same frame would be a parquet/
Iceberg dim loaded with spark.read. ``grid_cell_idx`` preserves file
order (the reference's concat order), which is the deterministic
tiebreak when a point sits on a shared cell boundary.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def load_grid_features(spark: SparkSession, paths: list[str]) -> DataFrame:
    """FeatureCollection files → (grid_cell_idx, lat_start, lat_end,
    lng_start, lng_end, <feature properties...>)."""
    rows: list[dict] = []
    idx = 0
    for path in paths:
        with open(path) as f:
            fc = json.load(f)
        for feat in fc["features"]:
            ring = feat["geometry"]["coordinates"][0]
            lats = [p[0] for p in ring]
            lngs = [p[1] for p in ring]
            rows.append(
                {
                    "grid_cell_idx": idx,
                    "lat_start": min(lats),
                    "lat_end": max(lats),
                    "lng_start": min(lngs),
                    "lng_end": max(lngs),
                    **{k: float(v) for k, v in feat["properties"].items()},
                }
            )
            idx += 1
    return spark.createDataFrame(pd.DataFrame(rows))
