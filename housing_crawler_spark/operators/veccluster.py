"""Fast k-means-cell assignment for the embedding-space queries.

Drop-in equivalent of ``queries_ml2._df_assign`` — same rounded-cosine
argmax with the same cid tiebreak, so the assigned cells (and therefore
every downstream oracle row) are identical — but restructured for the
r07 optimization round (guide §1.2 "the distributed algorithm first"):

- per-ROW and per-CENTROID norms are hoisted out of the (row × centroid)
  loop: ``cosine(e, c)`` evaluates three interpreted array folds per
  pair (dot(e,c), dot(e,e), dot(c,c)); precomputing ``nrm_e``/``nrm_c``
  makes it one fold per pair. Bit-identical: the denominator is still
  sqrt(dot(e,e)) * sqrt(dot(c,c)) evaluated in the same order on the
  same doubles.
- the nprobe=1 argmax is a ``max_by`` aggregation instead of a
  row_number window: partial (map-side) aggregation replaces the
  sort + WindowGroupLimit pipeline, and the shuffle carries n rows,
  not n×K (guide §2.3 "aggregate before you shuffle"). max_by on
  struct(rcos, -cid) == first row of orderBy(rcos DESC, cid ASC):
  cid is unique per group, so there are no residual ties.
- nprobe>1 callers (the probe-side multi-list scan: a handful of probe
  rows) keep the window path — it is not on any hot path.

Lives in operators/ (not a queries_* module) so the gate-rotation
fingerprints of the query modules that import it stay stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queries_ml import dot


def _nrm(col: F.Column) -> F.Column:
    return F.sqrt(dot(col, col))


_EMB_DIM_CACHE: dict[str, int] = {}


def emb_dim(sf_dir: str) -> int:
    """Embedding dimensionality for this sf_dir from one parquet batch
    (plan-time metadata peek, not a Spark job; memoized per dir)."""
    if sf_dir not in _EMB_DIM_CACHE:
        import pyarrow.parquet as pq

        batch = next(
            pq.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
                batch_size=1, columns=["embedding"]
            )
        )
        _EMB_DIM_CACHE[sf_dir] = len(batch["embedding"][0])
    return _EMB_DIM_CACHE[sf_dir]


def _mean_arr(vec_col: str, dim: int) -> list[F.Column]:
    return [
        F.round(F.avg(F.element_at(vec_col, i)) + F.lit(1e-9), 4).alias(f"__m_{i}")
        for i in range(1, dim + 1)
    ]


def fast_recenter(assigned: DataFrame, dim: int) -> DataFrame:
    """Centroid update equivalent to queries_ml2._df_recenter — per-cid
    per-position rounded means — but via ``dim`` per-position avg
    aggregates instead of posexplode → (cid, pos) aggregate →
    collect_list re-assembly: one shuffle of K·dim partial sums instead
    of two shuffles of n·dim exploded rows (guide §2.3). Same Average
    aggregate over the same value multiset; partial-sum order is
    nondeterministic in BOTH shapes and absorbed by the same
    round(+1e-9, 4), exactly the tolerance the SQL twin relies on."""
    means = assigned.groupBy("cid").agg(*_mean_arr("e", dim))
    return means.select(
        "cid", F.array(*[F.col(f"__m_{i}") for i in range(1, dim + 1)]).alias("c")
    )


def pq_fast_recenter(assigned: DataFrame, d: int) -> DataFrame:
    """Same rewrite for the PQ codebook update (per (j, cid) subspace
    groups of d-dim slices); twin of queries_ml3._pq_recenter."""
    means = assigned.groupBy("j", "cid").agg(*_mean_arr("sv", d))
    return means.select(
        "j",
        "cid",
        F.array(*[F.col(f"__m_{i}") for i in range(1, d + 1)]).alias("cv"),
    )


def fast_assign(base: DataFrame, cents: DataFrame, nprobe: int = 1) -> DataFrame:
    """argmax-cosine cell assignment vs the broadcast K-row centroid dim;
    result-identical to queries_ml2._df_assign (same rounding, same
    tiebreaks), one array fold per (row, centroid) instead of three."""
    b = base.select("vec_id", "e", _nrm(F.col("e")).alias("__ne")).alias("b")
    c = F.broadcast(
        cents.select("cid", "c", _nrm(F.col("c")).alias("__nc"))
    ).alias("c")
    rcos = F.round(
        dot(F.col("b.e"), F.col("c.c")) / (F.col("b.__ne") * F.col("c.__nc"))
        + F.lit(1e-9),
        6,
    )
    scored = b.crossJoin(c).select(
        "vec_id", "e", "cid", rcos.alias("__rcos")
    )
    if nprobe == 1:
        best = scored.groupBy("vec_id").agg(
            F.max_by(
                F.struct(F.col("cid"), F.col("e")),
                F.struct(F.col("__rcos"), (-F.col("cid")).alias("__nid")),
            ).alias("__s")
        )
        return best.select(
            "vec_id", F.col("__s.e").alias("e"), F.col("__s.cid").alias("cid")
        )
    w = Window.partitionBy("vec_id").orderBy(F.desc("__rcos"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= nprobe)
        .select("vec_id", "e", "cid")
    )


def pq_fast_assign(sub: DataFrame, cents: DataFrame, dist, idcol: str = "vec_id") -> DataFrame:
    """Result-identical twin of queries_ml3._pq_assign: nearest-centroid
    per (vector, subspace) on round(dist + 1e-9, 6) with cid tiebreak,
    but via min_by partial aggregation instead of a row_number window —
    the shuffle carries one row per (id, j) group instead of K, and the
    sort + WindowGroupLimit pipeline disappears (guide §2.3/§2.4).
    ``dist`` is the caller's fold (ml3's _pq_l2) so the scored doubles
    stay bit-identical to the SQL twin."""
    s, c = sub.alias("s"), F.broadcast(cents).alias("c")
    rd = F.round(dist(F.col("s.sv"), F.col("c.cv")) + F.lit(1e-9), 6)
    scored = s.join(c, F.col("s.j") == F.col("c.j")).select(
        idcol, F.col("s.j").alias("j"), "sv", "cid", rd.alias("__rd")
    )
    best = scored.groupBy(idcol, "j").agg(
        F.min_by(
            F.struct(F.col("cid"), F.col("sv")),
            F.struct(F.col("__rd"), F.col("cid")),
        ).alias("__s")
    )
    return best.select(
        idcol, "j", F.col("__s.sv").alias("sv"), F.col("__s.cid").alias("cid")
    )


def flat_lut(lut: DataFrame, m: int, k: int) -> DataFrame:
    """(probe_id, j, cid, pd_x1e6) → (probe_id, lut_flat) where
    lut_flat[j*k + cid] = pd_x1e6 — one m·k-slot long array per probe,
    so the ADC sum becomes an inline expression instead of an m-way
    join + 20M-group hash aggregate (guide §2.3: shuffle keys and
    metadata, not an exploded fact table)."""
    return lut.groupBy("probe_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (F.col("j") * k + F.col("cid")).alias("slot"),
                        F.col("pd_x1e6").alias("pd"),
                    )
                )
            ),
            lambda x: x["pd"],
        ).alias("lut_flat")
    )


def codes_as_array(codes: DataFrame, m: int, idcol: str = "vec_id") -> DataFrame:
    """(id, j, code) → (id, code_arr) with code_arr[j] = code."""
    return codes.groupBy(idcol).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("j").alias("j"), F.col("code").alias("code")))
            ),
            lambda x: x["code"],
        ).alias("code_arr")
    )


def adc_sum(code_arr: F.Column, lut_flat: F.Column, m: int, k: int) -> F.Column:
    """sum over j of lut_flat[j*k + code_arr[j]] — integer sum, so any
    evaluation order is exact; unrolled (m is 8) for codegen."""
    terms = [
        F.element_at(
            lut_flat,
            ((F.lit(j * k) + F.element_at(code_arr, j + 1)) + 1).cast("int"),
        )
        for j in range(m)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
