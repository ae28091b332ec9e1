"""grid_feature_join unit semantics: rect vs bowtie containment,
boundary multi-match, bucket-expansion correctness for cells spanning
bucket lines, and left-join behavior for uncovered points."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from housing_crawler_spark.operators.spatial import grid_feature_join

# two adjacent 1x1 cells sharing the lat=1 edge
GRID = pd.DataFrame(
    [
        {"grid_cell_idx": 0, "lat_start": 0.0, "lat_end": 1.0,
         "lng_start": 0.0, "lng_end": 1.0, "feat": 10.0},
        {"grid_cell_idx": 1, "lat_start": 1.0, "lat_end": 2.0,
         "lng_start": 0.0, "lng_end": 1.0, "feat": 20.0},
    ]
)

PTS = pd.DataFrame(
    [
        {"pid": 1, "latitude": 0.5, "longitude": 0.5},   # center of cell 0
        {"pid": 2, "latitude": 0.5, "longitude": 0.05},  # bottom triangle (bowtie-excluded)
        {"pid": 3, "latitude": 1.0, "longitude": 0.5},   # shared edge → both cells (rect)
        {"pid": 4, "latitude": 5.0, "longitude": 5.0},   # outside all cells
        {"pid": 5, "latitude": 0.05, "longitude": 0.5},  # left triangle (bowtie-included)
    ]
)


@pytest.fixture(scope="module")
def frames(spark):
    return spark.createDataFrame(PTS), spark.createDataFrame(GRID)


def _rows(df):
    return {
        (r["pid"], r["grid_cell_idx"]): r["feat"]
        for r in df.select("pid", "grid_cell_idx", "feat").collect()
    }


def test_rect_containment(frames):
    pts, grid = frames
    out = _rows(grid_feature_join(pts, grid, geometry="rect"))
    assert out[(1, 0)] == 10.0
    assert out[(2, 0)] == 10.0  # rect includes the bottom triangle
    # shared edge matches BOTH cells (boundary-inclusive, like sjoin)
    assert (3, 0) in out and (3, 1) in out
    assert (4, None) in out  # left join keeps uncovered points
    assert out[(5, 0)] == 10.0


def test_bowtie_containment(frames):
    """The reference's self-intersecting polygons cover only the
    left/right triangles (in normalized (u=lat, v=lng) coords,
    (v-u)(v+u-1) <= 0)."""
    pts, grid = frames
    out = _rows(grid_feature_join(pts, grid, geometry="bowtie"))
    assert out[(1, 0)] == 10.0  # center (on both diagonals) included
    assert (2, None) in out and (2, 0) not in out  # bottom triangle excluded
    assert out[(5, 0)] == 10.0  # left triangle included
    assert (4, None) in out


def test_cell_spanning_bucket_lines(spark):
    """A cell larger than its neighbors spans several coarse buckets;
    points anywhere inside must still match (the expansion must cover
    every overlapped bucket)."""
    grid = spark.createDataFrame(
        pd.DataFrame(
            [
                {"grid_cell_idx": 0, "lat_start": 0.0, "lat_end": 4.0,
                 "lng_start": 0.0, "lng_end": 4.0, "feat": 1.0},
                {"grid_cell_idx": 1, "lat_start": 4.0, "lat_end": 4.5,
                 "lng_start": 4.0, "lng_end": 4.5, "feat": 2.0},
            ]
        )
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            [{"pid": i, "latitude": 0.3 + i, "longitude": 3.7 - i} for i in range(4)]
        )
    )
    out = grid_feature_join(pts, grid, geometry="rect")
    matched = out.filter(F.col("grid_cell_idx") == 0).count()
    assert matched == 4
