"""Model-artifact source/sink + weekly walk-forward trainer (SURVEY S10).

The reference trains one price model per ISO week on all ads published
BEFORE that week and pickles each into model/trained_models/
(train_model_weeks.py:36-72: sklearn pipeline, log-target). sklearn
isn't in this container — and a pickle directory isn't a cluster
artifact anyway — so the Spark-first re-expression is:

- the MODEL STORE is a parquet table of coefficient rows
  (week, n_train, slope, intercept) — readable/joinable/versionable
  like every other table (write_models/read_models);
- TRAINING is the closed-form log-target OLS, and the reference's
  per-week loop ("train on everything strictly earlier") collapses
  into ONE window pass: per-week sufficient statistics
  (n, Σx, Σy, Σxy, Σx²) then cumulative sums over week order with
  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING. Every week's
  model materializes in a single job — no driver loop, no quadratic
  re-scan of history (the reference re-reads the whole CSV per week);
- APPLY is a broadcast join of ads to their week's coefficients:
  ŷ = exp(intercept + slope·x), the reference's commented
  model.predict row-lambda (ads_table_processing.py:97-102) as a
  native expression.

The OLS denominator n·Σx² − (Σx)² involves only integer-valued
doubles, so the zero-variance guard is exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def iso_week_tag(d: Column) -> Column:
    """ISO-year*100 + ISO-week as one orderable int (the reference's
    '%G' + 'W' + '%V' tag, train_model_weeks.py:34). Spark has no
    isoyear(); the ISO year is the calendar year of the week's
    Thursday (dayofweek is 1=Sunday → isodow = ((dow+5) % 7) + 1)."""
    isodow = (F.dayofweek(d) + 5) % 7 + 1
    iso_year = F.year(F.date_add(d, F.lit(4) - isodow))
    return (iso_year * 100 + F.weekofyear(d)).alias("wk")


def tag_ads(ads: DataFrame) -> DataFrame:
    """Raw-ads table (published_on in either reference format) →
    modelable rows (id, price_euros, size_sqm, wk)."""
    pub = F.coalesce(
        F.try_to_date(F.col("published_on"), "dd.MM.yyyy"),
        F.try_to_date(F.col("published_on"), "yyyy-MM-dd"),
    )
    return ads.filter(
        (F.col("price_euros") > 0) & F.col("size_sqm").isNotNull()
    ).select("id", "price_euros", "size_sqm", iso_week_tag(pub))


def train_weekly_models(
    ads: DataFrame, y: str = "price_euros", x: str = "size_sqm", wk: str = "wk"
) -> DataFrame:
    """Walk-forward weekly log-target OLS: for every week present, fit
    ln(y) = intercept + slope·x on ALL rows of strictly earlier weeks.
    Input needs positive ``y``, non-null ``x``, and an int week tag.

    Scale shape: the ads table reduces map-side to per-week sufficient
    statistics FIRST (one shuffle on wk), so the unpartitioned
    cumulative window only ever sees |weeks| rows (a few thousand for
    decades of data) — the single-partition window is over the tiny
    aggregate, never the facts."""
    xe = F.col(x).cast("double")
    ye = F.log(F.col(y).cast("double"))
    weekly = ads.groupBy(wk).agg(
        F.count("*").alias("n"),
        F.sum(ye).alias("sy"),
        F.sum(xe).alias("sx"),
        F.sum(xe * ye).alias("sxy"),
        F.sum(xe * xe).alias("sxx"),
    )
    # explicit single-partition spec over the |weeks|-row aggregate
    # (same plan, silences the benign WindowExec no-partition warning)
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(wk)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = weekly.select(
        wk,
        F.sum("n").over(w).alias("cn"),
        F.sum("sy").over(w).alias("csy"),
        F.sum("sx").over(w).alias("csx"),
        F.sum("sxy").over(w).alias("csxy"),
        F.sum("sxx").over(w).alias("csxx"),
    )
    cn = F.col("cn")
    denom = cn * F.col("csxx") - F.col("csx") * F.col("csx")
    slope = (cn * F.col("csxy") - F.col("csx") * F.col("csy")) / denom
    intercept = (F.col("csy") - slope * F.col("csx")) / cn
    return (
        cum.filter(cn >= 2)
        .filter(denom > 0)
        .select(
            wk,
            cn.cast("long").alias("n_train"),
            slope.alias("slope"),
            intercept.alias("intercept"),
        )
    )


def apply_weekly_models(
    ads: DataFrame, models: DataFrame, x: str = "size_sqm", wk: str = "wk"
) -> DataFrame:
    """ŷ = exp(intercept + slope·x) from the ad's OWN week's model —
    predictions for week w only ever use data from weeks < w."""
    pred = F.exp(F.col("intercept") + F.col("slope") * F.col(x).cast("double"))
    return ads.join(F.broadcast(models), wk).withColumn("pred", pred)


# ---------------------------------------------------------------------------
# Multi-feature walk-forward ridge (the reference fits its pipeline on
# the FULL feature matrix per week, train_model_weeks.py:66 — the
# single-regressor S10 above keeps the walk-forward shape; this closes
# the k-feature fidelity gap with a closed-form ridge).
# ---------------------------------------------------------------------------
#
# Method: per-week sufficient statistics for the augmented design
# (1, x1..xk) — n, Σy, Σxi, Σxixj (i≤j), Σxiy — cumulated over week
# order with the same ROWS UNBOUNDED PRECEDING AND 1 PRECEDING window
# (one pass, no per-week re-scan). The intercept is eliminated
# analytically: centered Gram C[i][j] = Σxixj − ΣxiΣxj/n and
# d[i] = Σxiy − ΣxiΣy/n give the classic ridge normal equations
# (C + λI)β = d with UNPENALIZED intercept β0 = (Σy − β·Σx)/n —
# far better conditioned than solving the raw 4×4 system.
#
# The k×k solve is Cramer's rule emitted as ONE shared expression
# string evaluated by F.expr on the Spark side and inlined verbatim in
# the DuckDB oracle: identical parse tree → identical IEEE arithmetic
# → the driver's value hash matches bit-for-bit (the numerical
# ACCURACY of the closed form is pinned separately by the numpy
# lstsq/solve twin in tests/test_models.py).

RIDGE_LAMBDA = 1.0
FEATURE_EPOCH = "1992-01-01"  # days-since epoch for the time-trend feature


def tag_ads_multi(ads: DataFrame) -> DataFrame:
    """Raw-ads table → k=3 modelable rows (id, wk, y, x1..x3):
    y = ln(price), x1 = size_sqm, x2 = WG_size (flat capacity),
    x3 = days since FEATURE_EPOCH / 100 (time trend, scaled to keep
    the Gram entries well-conditioned)."""
    pub = F.coalesce(
        F.try_to_date(F.col("published_on"), "dd.MM.yyyy"),
        F.try_to_date(F.col("published_on"), "yyyy-MM-dd"),
    )
    return ads.filter(
        (F.col("price_euros") > 0) & F.col("size_sqm").isNotNull()
    ).select(
        "id",
        iso_week_tag(pub),
        F.log(F.col("price_euros").cast("double")).alias("y"),
        F.col("size_sqm").cast("double").alias("x1"),
        F.col("WG_size").cast("double").alias("x2"),
        (F.datediff(pub, F.lit(FEATURE_EPOCH)).cast("double") / 100.0).alias("x3"),
    )


def _det3(m: list[list[str]]) -> str:
    """Fully parenthesized 3x3 determinant — identical text (hence
    identical evaluation order) in Spark SQL and DuckDB."""
    return (
        f"({m[0][0]}*({m[1][1]}*{m[2][2]} - {m[1][2]}*{m[2][1]})"
        f" - {m[0][1]}*({m[1][0]}*{m[2][2]} - {m[1][2]}*{m[2][0]})"
        f" + {m[0][2]}*({m[1][0]}*{m[2][1]} - {m[1][1]}*{m[2][0]}))"
    )


def ridge3_exprs(lam: float = RIDGE_LAMBDA) -> dict[str, str]:
    """Expression strings for (b0, b1, b2, b3) over the cumulative
    columns cn, csy, csx1..3, cs11..cs33, csy1..3 (all DOUBLE).
    Shared verbatim by both engines."""
    # centered Gram + ridge diagonal, centered cross-moments
    c = {}
    for i in range(1, 4):
        for j in range(i, 4):
            base = f"(cs{i}{j} - csx{i}*csx{j}/cn)"
            c[(i, j)] = f"({base} + {lam!r})" if i == j else base
            c[(j, i)] = c[(i, j)]
    d = {i: f"(csy{i} - csx{i}*csy/cn)" for i in range(1, 4)}
    a = [[c[(i, j)] for j in range(1, 4)] for i in range(1, 4)]
    det = _det3(a)
    bs = {}
    for i in range(3):
        ai = [row[:] for row in a]
        for r in range(3):
            ai[r][i] = d[r + 1]
        bs[f"b{i + 1}"] = f"({_det3(ai)} / {det})"
    bs["b0"] = (
        f"((csy - ({bs['b1']}*csx1 + {bs['b2']}*csx2 + {bs['b3']}*csx3)) / cn)"
    )
    return bs


def train_weekly_models_multi(
    ads: DataFrame, lam: float = RIDGE_LAMBDA, min_train: int = 4
) -> DataFrame:
    """Walk-forward weekly k-feature ridge (k=3): for every week, fit
    ln(price) ~ 1 + x1 + x2 + x3 on ALL rows of strictly earlier
    weeks, in ONE window pass. Input: (wk, y, x1, x2, x3) — see
    tag_ads_multi. Output: (wk, n_train, b0..b3).

    Scale shape mirrors train_weekly_models: facts reduce map-side to
    14 per-week sufficient statistics (one shuffle on wk), the
    unpartitioned cumulative window sees only |weeks| rows."""
    y = F.col("y")
    xs = [F.col(f"x{i}") for i in range(1, 4)]
    aggs = [F.count("*").cast("double").alias("n"), F.sum(y).alias("sy")]
    aggs += [F.sum(x).alias(f"sx{i + 1}") for i, x in enumerate(xs)]
    for i in range(3):
        for j in range(i, 3):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"s{i + 1}{j + 1}"))
    aggs += [F.sum(x * y).alias(f"sy{i + 1}") for i, x in enumerate(xs)]
    weekly = ads.groupBy("wk").agg(*aggs)
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_cols = [F.sum("n").over(w).alias("cn"), F.sum("sy").over(w).alias("csy")]
    cum_cols += [F.sum(f"sx{i}").over(w).alias(f"csx{i}") for i in range(1, 4)]
    for i in range(1, 4):
        for j in range(i, 4):
            cum_cols.append(F.sum(f"s{i}{j}").over(w).alias(f"cs{i}{j}"))
    cum_cols += [F.sum(f"sy{i}").over(w).alias(f"csy{i}") for i in range(1, 4)]
    cum = weekly.select("wk", *cum_cols)
    bs = ridge3_exprs(lam)
    return cum.filter(F.col("cn") >= min_train).select(
        "wk",
        F.col("cn").cast("long").alias("n_train"),
        *[F.expr(bs[f"b{i}"]).alias(f"b{i}") for i in range(4)],
    )


def apply_weekly_models_multi(ads: DataFrame, models: DataFrame) -> DataFrame:
    """ŷ = exp(b0 + Σ bi·xi) from the ad's OWN week's model (broadcast
    coefficient join, like apply_weekly_models)."""
    pred = F.exp(
        F.col("b0")
        + F.col("b1") * F.col("x1")
        + F.col("b2") * F.col("x2")
        + F.col("b3") * F.col("x3")
    )
    return ads.join(F.broadcast(models), "wk").withColumn("pred", pred)


# ---------------------------------------------------------------------------
# General k-feature walk-forward ridge (round-4 verdict item 6: the
# Cramer solve above is hardwired to k=3; the reference fits its FULL
# feature matrix, train_model_weeks.py:66). Gaussian elimination
# without pivoting on the centered ridge system (C + λI)β = d — safe,
# the matrix is symmetric positive definite — emitted as a CHAIN of
# named intermediate expressions (one stage per elimination /
# back-substitution step). Both engines evaluate the SAME expression
# strings stage by stage (Spark: chained selects via F.expr; DuckDB:
# chained CTEs), so parse trees and hence IEEE results are identical;
# numerical accuracy is pinned by the numpy lstsq twin in
# tests/test_models.py. Expression-size note: stages keep each formula
# a 3-term combination of named prior columns — no k!-term Cramer
# blowup, O(k^3) total ops.
# ---------------------------------------------------------------------------


def gauss_ridge_stages(k: int, lam: float = RIDGE_LAMBDA) -> list[dict[str, str]]:
    """Ordered stages of {new_column: expression} solving the centered
    ridge normal equations over the cumulative-stat columns
    (cn, csy, csx1..k, cs{i}{j} i≤j, csy1..k). Each stage references
    only columns from earlier stages, so it maps 1:1 onto both a Spark
    select chain and a DuckDB CTE chain. Final stage yields b0..bk."""
    assert 1 <= k <= 9, "single-digit feature indices"
    stages: list[dict[str, str]] = []
    init: dict[str, str] = {}
    for i in range(1, k + 1):
        for j in range(i, k + 1):
            base = f"(cs{i}{j} - csx{i}*csx{j}/cn)"
            init[f"g0_{i}_{j}"] = f"({base} + {lam!r})" if i == j else base
        init[f"h0_{i}"] = f"(csy{i} - csx{i}*csy/cn)"
    stages.append(init)
    for p in range(1, k):
        st: dict[str, str] = {}
        piv = f"g{p - 1}_{p}_{p}"
        for i in range(p + 1, k + 1):
            for j in range(i, k + 1):
                st[f"g{p}_{i}_{j}"] = (
                    f"(g{p - 1}_{i}_{j} - g{p - 1}_{p}_{i}*g{p - 1}_{p}_{j}/{piv})"
                )
            st[f"h{p}_{i}"] = (
                f"(h{p - 1}_{i} - g{p - 1}_{p}_{i}*h{p - 1}_{p}/{piv})"
            )
        stages.append(st)
    for i in range(k, 0, -1):  # back-substitution, one stage per b_i
        terms = "".join(f" - g{i - 1}_{i}_{j}*b{j}" for j in range(i + 1, k + 1))
        stages.append({f"b{i}": f"((h{i - 1}_{i}{terms}) / g{i - 1}_{i}_{i})"})
    b0 = " + ".join(f"b{i}*csx{i}" for i in range(1, k + 1))
    stages.append({"b0": f"((csy - ({b0})) / cn)"})
    return stages


def gauss_ridge_sql(k: int, lam: float = RIDGE_LAMBDA, src: str = "cumk") -> tuple[str, str]:
    """(CTE chain text, final CTE name) for the DuckDB oracle — the
    same stages gauss_ridge_stages feeds Spark, verbatim."""
    ctes, prev = [], src
    for idx, st in enumerate(gauss_ridge_stages(k, lam)):
        name = f"gstage{idx}"
        cols = ", ".join(f"{e} AS {n}" for n, e in st.items())
        ctes.append(f"{name} AS (SELECT *, {cols} FROM {prev})")
        prev = name
    return ",\n    ".join(ctes), prev


def train_weekly_models_k(
    ads: DataFrame, k: int, lam: float = RIDGE_LAMBDA, min_train: int = 8
) -> DataFrame:
    """Walk-forward weekly k-feature ridge for ANY k (1..9): fit
    ln(price) ~ 1 + x1..xk on all strictly-earlier weeks in one
    cumulative-window pass. Input (wk, y, x1..xk); output
    (wk, n_train, b0..bk).

    Scale shape as train_weekly_models_multi: facts reduce map-side to
    O(k²) per-week sufficient statistics, the single-partition window
    only ever sees |weeks| rows."""
    y = F.col("y")
    aggs = [F.count("*").cast("double").alias("n"), F.sum(y).alias("sy")]
    aggs += [F.sum(F.col(f"x{i}")).alias(f"sx{i}") for i in range(1, k + 1)]
    for i in range(1, k + 1):
        for j in range(i, k + 1):
            aggs.append(F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"s{i}{j}"))
    aggs += [F.sum(F.col(f"x{i}") * y).alias(f"sy{i}") for i in range(1, k + 1)]
    weekly = ads.groupBy("wk").agg(*aggs)
    # partitionBy(lit(1)) = same single partition, but an EXPLICIT spec
    # (silences the benign WindowExec no-partition warning; the frame
    # is the |weeks|-row aggregate, never the facts)
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_cols = [F.sum("n").over(w).alias("cn"), F.sum("sy").over(w).alias("csy")]
    cum_cols += [F.sum(f"sx{i}").over(w).alias(f"csx{i}") for i in range(1, k + 1)]
    for i in range(1, k + 1):
        for j in range(i, k + 1):
            cum_cols.append(F.sum(f"s{i}{j}").over(w).alias(f"cs{i}{j}"))
    cum_cols += [F.sum(f"sy{i}").over(w).alias(f"csy{i}") for i in range(1, k + 1)]
    df = weekly.select("wk", *cum_cols).filter(F.col("cn") >= min_train)
    for st in gauss_ridge_stages(k, lam):
        df = df.select("*", *[F.expr(e).alias(n) for n, e in st.items()])
    return df.select(
        "wk",
        F.col("cn").cast("long").alias("n_train"),
        *[F.col(f"b{i}") for i in range(0, k + 1)],
    )


def write_models(models: DataFrame, path: str) -> None:
    """Artifact sink: the pickle directory becomes a parquet table."""
    models.write.mode("overwrite").parquet(path)


def read_models(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
