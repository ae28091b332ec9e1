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
    w = Window.orderBy(wk).rowsBetween(Window.unboundedPreceding, -1)
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


def write_models(models: DataFrame, path: str) -> None:
    """Artifact sink: the pickle directory becomes a parquet table."""
    models.write.mode("overwrite").parquet(path)


def read_models(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
