"""Round-5 additions to the LLM-data-pipeline family: data-selection /
quality-scoring operators from the published curation literature, a
point-in-time (as-of) join, an islands-and-gaps streak window, and
image-curation operators over the opaque image column.

All are oracle-verified (dual Spark + DuckDB text) and follow the
package's scale rules: pure JVM expressions (Python only in the
m9/m10 image Arrow stages, which are materialized before the returned
plan), equi-joins/windows keyed by data keys, integer-scaled floats
wherever a sum's order could drift between engines.

Citations (public papers — the reference repo has no counterpart for
these; they are the "beyond the reference" training-data operators the
build brief asks for):
  - t12: Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling" (DSIR) — hashed n-gram bucket counts,
    log importance ratio target/raw.
  - t13: Wenzek et al. 2020, "CCNet" — per-document LM cross-entropy
    scoring with head/middle/tail buckets (unigram add-one LM here;
    CCNet uses a 5-gram KenLM, same pipeline shape).
  - t14: Rae et al. 2021, "Gopher" Table A1 — the quality-rule
    battery beyond t9's repetition rules.
  - t15: Brown et al. 2020, GPT-3 appendix A — the curated-vs-crawl
    quality classifier whose score gates training data (closed-form
    ridge probe here instead of logistic regression; same pipeline).
  - m9: Schuhmann et al. 2021, "LAION-400M" — metadata/caption filters
    + exact-hash image dedup keeping the best-resolution copy.
  - m10: the LAION/DataComp-style image quality pre-filter (exposure
    and contrast gates) over decoded pixels.
  - j9: the classic point-in-time join (ASOF JOIN in DuckDB/kdb); the
    Spark-side shape is the union + cumulative-window trick, one
    shuffle keyed by the join key (generic operator: operators/asof.py).
  - s6: Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    Search" — subspace codebooks + asymmetric-distance (ADC) scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .matpaths import mat_path
from .queries import load, query, r4
from .queries_ml import _TOKENS_SQL, md5int, tokens
from .queries_ml2 import _tok_ngrams_all, _tok_ngrams_all_sql

# ---------------------------------------------------------------------------
# t12 — DSIR importance-resampling selection (Xie et al. 2023): hashed
# unigram+bigram counts into B buckets; per-bucket log importance ratio
# ln(p_target) - ln(p_raw) with add-one smoothing; per-doc weight =
# Σ_grams count · log-ratio. Docs scoring > 0 look more target-like
# than raw-like and are selected.
#
# 100 TB shape: ONE text scan (uni+bi grams exploded together), two
# keyed aggregations ((doc_id, bucket) then bucket), the B-row
# log-ratio table broadcast back against the per-doc bucket counts,
# one final groupBy(doc_id). No cross joins, no windows over data-sized
# frames (the only window is over the B=1024-row bucket table).
# Log-ratios are integer-scaled (×1e6, epsilon-rounded) so the per-doc
# sum is an exact integer in both engines regardless of addition order.
# ---------------------------------------------------------------------------

_T12_B = 1024  # hash buckets (DSIR uses 10k for full CC; 1024 keeps the
# bucket table trivially broadcastable and is plenty at test sf)
_T12_TARGET_SQL = "lang = 'en'"  # the "target domain" proxy


def _t12_lr_sql(tc: str, rc: str, tn: str, rn: str) -> str:
    """The log-importance-ratio expression — ONE string used verbatim
    by both engines so the doubles are bit-identical (same parse tree
    → same IEEE ops; ln's last-ulp risk is absorbed by the ×1e6
    integer scaling's 1e-9 epsilon)."""
    return (
        f"CAST(round((ln(({tc} + 1.0) / ({tn} + {_T12_B}.0)) "
        f"- ln(({rc} + 1.0) / ({rn} + {_T12_B}.0))) * 1000000.0 + 1e-9, 0) "
        f"AS BIGINT)"
    )


@query(
    "t12_dsir_selection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKENS_SQL} AS tk
      FROM documents WHERE length(text) > 0
    ),
    grams AS (
      SELECT doc_id, lang, unnest(tk) AS g FROM toks
      UNION ALL
      SELECT doc_id, lang, unnest({_tok_ngrams_all_sql("tk", 2)}) AS g
      FROM toks
    ),
    bg AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {_T12_B} AS b,
             count(*)::BIGINT AS cnt
      FROM grams GROUP BY ALL
    ),
    buckets AS (
      SELECT b, sum(cnt)::BIGINT AS rc,
             sum(CASE WHEN {_T12_TARGET_SQL} THEN cnt ELSE 0 END)::BIGINT AS tc
      FROM bg GROUP BY b
    ),
    lr AS (
      SELECT b, {_t12_lr_sql("tc", "rc", "sum(tc) OVER ()", "sum(rc) OVER ()")}
               AS lr_x1e6
      FROM buckets
    )
    SELECT doc_id,
           sum(cnt)::BIGINT AS n_feats,
           round(sum(cnt * lr_x1e6) / 1000000.0 + 1e-9, 4) AS weight,
           (sum(cnt * lr_x1e6) > 0)::INT AS selected
    FROM bg JOIN lr USING (b)
    GROUP BY doc_id
    """,
)
def t12_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: per-doc hashed-ngram importance weight vs
    the lang='en' target domain + selected flag (weight > 0)."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        # the documents parquet is 1-2 input splits — without this the
        # whole tokenize+hash pipeline runs on 1 of 32 cores
        .repartition(shuffle, "doc_id")
        .select("doc_id", "lang", tokens(F.col("text")).alias("tk"))
    )
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(F.col("tk"), _tok_ngrams_all(F.col("tk"), 2))
        ).alias("g"),
    )
    # bg feeds TWO branches (the bucket totals and the final join) —
    # cache it or the gram explode+hash re-runs per branch (the
    # fan-out-recompute trap, round-5 verify gotcha)
    bg = (
        grams.withColumn("b", md5int(F.col("g")) % _T12_B)
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("cnt"))
        .cache()
    )
    tot = Window.partitionBy(F.lit(1))  # B-row frame, not data-sized
    buckets = bg.groupBy("b").agg(
        F.sum("cnt").alias("rc"),
        F.sum(
            F.when(F.expr(_T12_TARGET_SQL), F.col("cnt")).otherwise(F.lit(0))
        ).alias("tc"),
    )
    # window totals materialized as columns first so the ln()
    # expression string stays IDENTICAL to the oracle's
    buckets2 = buckets.select(
        "b",
        "tc",
        "rc",
        F.sum("tc").over(tot).alias("tn"),
        F.sum("rc").over(tot).alias("rn"),
    )
    lr = buckets2.select(
        "b", F.expr(_t12_lr_sql("tc", "rc", "tn", "rn")).alias("lr_x1e6")
    )
    return (
        bg.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.round(
                F.sum(F.col("cnt") * F.col("lr_x1e6")) / 1000000.0
                + F.lit(1e-9),
                4,
            ).alias("weight"),
            (F.sum(F.col("cnt") * F.col("lr_x1e6")) > 0)
            .cast("int")
            .alias("selected"),
        )
    )


# ---------------------------------------------------------------------------
# t13 — CCNet-style LM quality scoring: add-one unigram LM trained on
# the "curated" sources, every doc scored by per-token cross-entropy,
# bucketed head/middle/tail. The vocab table carries a row for EVERY
# corpus token (target count 0 for OOV), so scoring is a single
# equi-join on token — no scalar cross joins, no OOV special path.
#
# 100 TB shape: one text scan → (doc_id, tok) counts; the vocab/logprob
# table is built from the same scan's target subset and joined back by
# token (an equi-join keyed by token; Catalyst broadcasts it while it
# fits, shuffles it when it doesn't). Log-probs integer-scaled ×1e6 so
# per-doc sums are exact integers.
# ---------------------------------------------------------------------------

_T13_TARGET_SQL = "source IN ('src0', 'src1', 'src2')"
_T13_HEAD = 3.40  # xent bucket cuts (fixed constants, not percentiles,
_T13_MID = 3.42  # so the statistic is deterministic and engine-portable;
# CCNet cuts at per-language perplexity terciles instead)

# add-one unigram log-prob, integer-scaled; c = target count of the
# token, n = total target tokens, v = target vocab size. One string,
# both engines (see _t12_lr_sql).
_T13_LP_SQL = (
    "CAST(round(ln((c + 1.0) / (n + v + 1.0)) * 1000000.0 + 1e-9, 0) "
    "AS BIGINT)"
)


@query(
    "t13_lm_quality_score",
    oracle=f"""
    WITH tokc AS (
      SELECT doc_id, source, unnest({_TOKENS_SQL}) AS tok
      FROM documents WHERE length(text) > 0
    ),
    dt AS (
      SELECT doc_id, tok, count(*)::BIGINT AS cnt FROM tokc GROUP BY ALL
    ),
    tgt AS (
      SELECT tok, count(*)::BIGINT AS c FROM tokc
      WHERE {_T13_TARGET_SQL} GROUP BY tok
    ),
    vocab AS (
      SELECT t.tok, coalesce(g.c, 0)::BIGINT AS c
      FROM (SELECT DISTINCT tok FROM tokc) t LEFT JOIN tgt g USING (tok)
    ),
    lp AS (
      SELECT tok, {_T13_LP_SQL} AS lp_x1e6
      FROM (
        SELECT tok, c,
               sum(c) OVER () AS n,
               sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) OVER () AS v
        FROM vocab
      )
    ),
    scored AS (
      SELECT d.doc_id,
             sum(d.cnt)::BIGINT AS n_tokens,
             round((-(sum(d.cnt * lp.lp_x1e6)) / 1000000.0) / sum(d.cnt)
                   + 1e-9, 4) AS xent
      FROM dt d JOIN lp USING (tok)
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens, xent,
           CASE WHEN xent < {_T13_HEAD} THEN 'head'
                WHEN xent < {_T13_MID} THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored
    """,
)
def t13_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram-LM cross-entropy vs the curated-source LM +
    head/middle/tail quality bucket (the CCNet pipeline shape)."""
    # tokc feeds THREE branches (doc counts, target counts, vocab) —
    # cache it or the tokenize+explode re-runs per branch
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tokc = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(shuffle, "doc_id")  # 1-2 splits otherwise, see t12
        .select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok"))
        .cache()
    )
    dt = tokc.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    tgt = (
        tokc.filter(F.expr(_T13_TARGET_SQL))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    vocab = (
        tokc.select("tok")
        .distinct()
        .join(tgt, "tok", "left")
        .select("tok", F.coalesce("c", F.lit(0)).alias("c"))
    )
    tot = Window.partitionBy(F.lit(1))  # |vocab|-row frame
    lp = vocab.select(
        "tok",
        "c",
        F.sum("c").over(tot).alias("n"),
        F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).over(tot).alias("v"),
    ).select("tok", F.expr(_T13_LP_SQL).alias("lp_x1e6"))
    scored = (
        dt.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.expr(
                "round((-(sum(cnt * lp_x1e6)) / 1000000.0) / sum(cnt)"
                " + 1e-9, 4)"
            ).alias("xent"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "xent",
        F.when(F.col("xent") < _T13_HEAD, "head")
        .when(F.col("xent") < _T13_MID, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# j9 — point-in-time (as-of) join: every click event matched to the
# most recent error event of the same user at-or-before its timestamp.
# DuckDB expresses this natively (ASOF LEFT JOIN); the Spark-side scale
# shape is the tagged union + cumulative window: ONE shuffle keyed by
# user_id, last(ignorenulls) over rows-unbounded-preceding. Right rows
# are pre-deduped to one per (user_id, ts) so the as-of winner is
# well-defined in both engines; right rows sort before left rows at
# equal ts, making the match inclusive (ts >= err_ts).
# ---------------------------------------------------------------------------


@query(
    "j9_asof_join",
    oracle="""
    WITH err AS (
      SELECT user_id, ts,
             max(event_id) AS prior_error_id,
             max_by(value, event_id) AS err_value
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, ts
    ),
    clk AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           round(c.value + 1e-9, 4) AS click_value,
           e.prior_error_id,
           round(e.err_value + 1e-9, 4) AS prior_error_value,
           epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
    FROM clk c ASOF LEFT JOIN err e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join clicks→latest prior error per user via the generic
    operators/asof.py operator (union + cumulative window, one shuffle
    on user_id — never a range join or per-key collect; the operator
    itself is property-tested against pandas.merge_asof)."""
    from .operators.asof import asof_join_backward

    ev = load(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")  # asof requires right unique per (by, ts)
        .agg(
            F.max("event_id").alias("err_id"),
            F.expr("max_by(value, event_id)").alias("err_value"),
        )
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    m = asof_join_backward(
        clk, err, by=["user_id"], ts="ts", right_cols=["err_id", "err_value"]
    )
    return m.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.round(F.col("value") + F.lit(1e-9), 4).alias("click_value"),
        F.col("err_id_matched").alias("prior_error_id"),
        F.round(F.col("err_value_matched") + F.lit(1e-9), 4).alias(
            "prior_error_value"
        ),
        (
            # events.ts is TIMESTAMP_NTZ; session tz is pinned UTC so
            # the cast is exactly DuckDB's epoch_us on the naive value
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_matched").cast("timestamp"))
        ).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# t14 — the full Gopher quality-rule battery (Rae et al. 2021 Table
# A1, complementing t9's repetition rules): word-count bounds, mean
# word length bounds, bullet-line / ellipsis-line fractions, and the
# stopword-presence check. The synthetic corpus is single-line word
# soup, so (like d7's planted near-dups) three degenerate families are
# planted identically in both engines to give every rule real work:
# bullet-list docs, ellipsis-line docs, and long-junk-word docs.
# Thresholds adapted to the corpus (documented deviations from the
# paper's 50..100k word window); rule flags compare the ROUNDED
# fractions so both engines branch on identical values.
#
# 100 TB shape: one scan, pure JVM string/array expressions per row,
# zero joins, zero shuffles before any downstream consumer.
# ---------------------------------------------------------------------------

_T14_STOPS = ("the", "a", "of", "to")


def _t14_planted_sql() -> str:
    return """
      SELECT doc_id, text FROM documents WHERE length(text) > 0
      UNION ALL
      SELECT doc_id + 3000000, repeat('- item' || chr(10), 20)
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + 4000000, repeat('waiting for more...' || chr(10), 10)
      FROM documents WHERE doc_id % 13 = 0
      UNION ALL
      SELECT doc_id + 5000000, repeat('zzzzzzzzzzzz ', 30)
      FROM documents WHERE doc_id % 17 = 0
    """


_T14_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in _T14_STOPS) + "]"


@query(
    "t14_gopher_quality_rules",
    oracle=f"""
    WITH corpus AS ({_t14_planted_sql()}),
    m AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n_words,
             round((length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                   / len({_TOKENS_SQL})) + 1e-9, 4) AS mean_word_len,
             round((len(list_filter(string_split(text, chr(10)),
                                    l -> starts_with(l, '- ')))::DOUBLE
                   / len(string_split(text, chr(10)))) + 1e-9, 4)
               AS frac_bullet,
             round((len(list_filter(string_split(text, chr(10)),
                                    l -> ends_with(l, '...')))::DOUBLE
                   / len(string_split(text, chr(10)))) + 1e-9, 4)
               AS frac_ellipsis,
             len(list_intersect(list_distinct({_TOKENS_SQL}),
                                {_T14_STOPS_SQL}))::INT AS n_stop
      FROM corpus
    )
    SELECT *,
           (n_words >= 10 AND n_words <= 10000
            AND mean_word_len >= 2 AND mean_word_len <= 10
            AND frac_bullet <= 0.9 AND frac_ellipsis <= 0.3
            AND n_stop >= 2)::INT AS kept
    FROM m
    """,
)
def t14_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules per doc: word-count / word-length
    bounds, bullet & ellipsis line fractions, stopword check, keep
    flag. Planted degenerate docs exercise every rule."""
    docs = load(spark, sf_dir, "documents")
    base = docs.filter(F.length("text") > 0).select("doc_id", "text")
    p1 = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.repeat(F.lit("- item\n"), 20).alias("text"),
    )
    p2 = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.repeat(F.lit("waiting for more...\n"), 10).alias("text"),
    )
    p3 = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.repeat(F.lit("zzzzzzzzzzzz "), 30).alias("text"),
    )
    corpus = base.unionByName(p1).unionByName(p2).unionByName(p3)
    tk = tokens(F.col("text"))
    lines = F.split("text", "\n")
    m = corpus.select(
        "doc_id",
        F.size(tk).alias("n_words"),
        r4(
            F.length(F.regexp_replace("text", r"\s+", "")).cast("double")
            / F.size(tk)
        ).alias("mean_word_len"),
        r4(
            F.size(F.filter(lines, lambda l: l.startswith("- "))).cast(
                "double"
            )
            / F.size(lines)
        ).alias("frac_bullet"),
        r4(
            F.size(F.filter(lines, lambda l: l.endswith("..."))).cast(
                "double"
            )
            / F.size(lines)
        ).alias("frac_ellipsis"),
        F.size(
            F.array_intersect(
                F.array_distinct(tk),
                F.array(*[F.lit(s) for s in _T14_STOPS]),
            )
        ).alias("n_stop"),
    )
    kept = (
        (F.col("n_words") >= 10)
        & (F.col("n_words") <= 10000)
        & (F.col("mean_word_len") >= 2)
        & (F.col("mean_word_len") <= 10)
        & (F.col("frac_bullet") <= 0.9)
        & (F.col("frac_ellipsis") <= 0.3)
        & (F.col("n_stop") >= 2)
    )
    return m.select("*", kept.cast("int").alias("kept"))


# ---------------------------------------------------------------------------
# w7 — islands-and-gaps: per (user, event_type), maximal runs of
# consecutive ACTIVE DAYS (≥1 event). The classic gaps-and-islands
# window shape the registry otherwise lacks: date minus dense row
# number is constant within a run, so one window + two keyed
# aggregations find every streak — no self-joins, no iteration.
# Partition sizes are bounded by a user's distinct active days.
# ---------------------------------------------------------------------------


@query(
    "w7_event_streaks",
    oracle="""
    WITH pe AS (
      SELECT DISTINCT user_id, event_type, ts::DATE AS d FROM events
    ),
    g AS (
      SELECT user_id, event_type, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY d) AS INT) AS grp
      FROM pe
    ),
    st AS (
      SELECT user_id, event_type, grp, count(*) AS len
      FROM g GROUP BY ALL
    )
    SELECT user_id, event_type,
           sum(len)::BIGINT AS n_active_days,
           count(*)::BIGINT AS n_streaks,
           max(len)::BIGINT AS longest_streak
    FROM st GROUP BY user_id, event_type
    """,
)
def w7_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per (user, event_type): count,
    total active days, and longest run."""
    pe = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("d")
    g = pe.select(
        "user_id",
        "event_type",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    st = g.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("len")
    )
    return st.groupBy("user_id", "event_type").agg(
        F.sum("len").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# m9 — LAION-style image-caption curation funnel over the opaque image
# column: metadata filters (min edge, aspect ratio, caption length),
# then exact-phash dedup keeping the best-resolution copy. The image
# table's metadata is materialized once (matpaths contract, like
# m1/m3); duplicate topology is controlled by planting half-resolution
# "re-posts" of every 5th image (the re-hosted-thumbnail case LAION
# dedups), exactly like _duped plants text dups for d1-d7.
#
# 100 TB shape: pure JVM after the Arrow gen stage — one scan of the
# metadata table, one window keyed by phash (partition sizes bounded by
# duplicate-cluster size), no joins at all: the dedup verdict is folded
# into the same window by ranking filter-passing rows first, so
# survivor ranks are contiguous and rn>1 ⇔ a better surviving copy
# exists.
# ---------------------------------------------------------------------------

_M9_MAT = mat_path("m9_imgmeta")
_M9_MIN_EDGE = 32
_M9_ASPECT = 3  # max(w,h) > 3*min(w,h) → bad aspect
_M9_CAP_MIN = 15  # caption chars


def _m9_funnel_sql() -> str:
    return f"""
    WITH base AS (
      SELECT image_id, w, h, fmt, caption, phash
      FROM read_parquet('{_M9_MAT}/*.parquet')
      UNION ALL
      SELECT image_id || '-re' AS image_id, w // 2 AS w, h // 2 AS h,
             fmt, caption, phash
      FROM read_parquet('{_M9_MAT}/*.parquet')
      WHERE phash % 5 = 0
    ),
    flagged AS (
      SELECT *,
             (w < {_M9_MIN_EDGE} OR h < {_M9_MIN_EDGE}) AS small,
             (greatest(w, h) > {_M9_ASPECT} * least(w, h)) AS aspect,
             (length(caption) < {_M9_CAP_MIN}) AS capshort
      FROM base
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY phash
               ORDER BY (NOT (small OR aspect OR capshort)) DESC,
                        w * h DESC, image_id
             ) AS rn
      FROM flagged
    )
    SELECT image_id, w, h, fmt,
           CASE WHEN small THEN 'too_small'
                WHEN aspect THEN 'bad_aspect'
                WHEN capshort THEN 'caption_short'
                WHEN rn > 1 THEN 'dup_lower_res'
           END AS reason
    FROM ranked
    """


@query(
    "m9_image_curation",
    oracle=f"""
    SELECT image_id, w, h, fmt, reason,
           (reason IS NULL)::INT AS kept
    FROM ({_m9_funnel_sql()})
    """,
)
def m9_image_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style curation verdict per image: first failing rule
    (too_small / bad_aspect / caption_short / dup_lower_res) or kept."""
    from .queries_multimodal import _image_table

    meta = _image_table(spark, sf_dir).select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    )
    meta.write.mode("overwrite").parquet(_M9_MAT)
    mat = spark.read.parquet(_M9_MAT)
    planted = mat.filter(F.col("phash") % 5 == 0).select(
        F.concat(F.col("image_id"), F.lit("-re")).alias("image_id"),
        F.expr("w div 2").alias("w"),
        F.expr("h div 2").alias("h"),
        "fmt",
        "caption",
        "phash",
    )
    base = mat.unionByName(planted)
    flagged = base.select(
        "*",
        ((F.col("w") < _M9_MIN_EDGE) | (F.col("h") < _M9_MIN_EDGE)).alias(
            "small"
        ),
        (
            F.greatest("w", "h") > _M9_ASPECT * F.least("w", "h")
        ).alias("aspect"),
        (F.length("caption") < _M9_CAP_MIN).alias("capshort"),
    )
    passes = ~(F.col("small") | F.col("aspect") | F.col("capshort"))
    w = Window.partitionBy("phash").orderBy(
        passes.desc(), (F.col("w") * F.col("h")).desc(), F.col("image_id")
    )
    ranked = flagged.select("*", F.row_number().over(w).alias("rn"))
    reason = (
        F.when(F.col("small"), "too_small")
        .when(F.col("aspect"), "bad_aspect")
        .when(F.col("capshort"), "caption_short")
        .when(F.col("rn") > 1, "dup_lower_res")
    )
    return ranked.select(
        "image_id",
        "w",
        "h",
        "fmt",
        reason.alias("reason"),
        reason.isNull().cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# m10 — image exposure/contrast quality filter over the opaque image
# column: decode every payload (real numpy codecs in an Arrow stage),
# apply a deterministic exposure jitter keyed on phash (the synthetic
# corpus is uniformly well-exposed, so — like the planted dups — the
# jitter controls the degenerate-case topology: dark / blown-out /
# flat-contrast variants), then measure per-image mean brightness and
# pixel std and materialize them integer-scaled (matpaths contract).
# The under/over-exposure + low-contrast verdict funnel runs in BOTH
# engines over the mat table; only the decode+stats numpy kernel stays
# outside the oracle (decode itself is pinned bit-exact by m1/parity).
#
# 100 TB shape: the Arrow stage is embarrassingly parallel after the
# repartition inside _image_table; the verdict is a per-row projection
# over the mat scan — no joins, no windows, no shuffles.
# ---------------------------------------------------------------------------

_M10_MAT = mat_path("m10_exposure")
_M10_UNDER = 4000  # mean_x100 < 40.00 → under-exposed
_M10_OVER = 21500  # mean_x100 > 215.00 → over-exposed
_M10_FLAT = 1000  # std_x100  < 10.00 → low contrast


@query(
    "m10_image_exposure_filter",
    oracle=f"""
    SELECT image_id, fmt, adj, mean_x100, std_x100, reason,
           (reason IS NULL)::INT AS kept
    FROM (
      SELECT *,
             CASE WHEN mean_x100 < {_M10_UNDER} THEN 'under_exposed'
                  WHEN mean_x100 > {_M10_OVER} THEN 'over_exposed'
                  WHEN std_x100 < {_M10_FLAT} THEN 'low_contrast'
             END AS reason
      FROM read_parquet('{_M10_MAT}/*.parquet')
    )
    """,
)
def m10_image_exposure_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure/contrast verdict per image: decode, deterministic
    phash-keyed exposure jitter, mean/std stats, then the
    under/over/flat funnel in both engines over the mat table."""
    from .queries_multimodal import _image_table

    imgs = _image_table(spark, sf_dir)

    def stats_batches(it):
        import numpy as np
        import pandas as pd

        from .operators.images import decode

        for pdf in it:
            out = {"image_id": [], "fmt": [], "adj": [], "mean_x100": [], "std_x100": []}
            for iid, buf, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["phash"]
            ):
                img, _ = decode(bytes(buf))
                case = int(ph) % 5  # python %: non-negative
                a, b, adj = {
                    0: (0.2, 0.0, "dark"),
                    1: (0.3, 200.0, "bright"),
                    2: (0.05, 120.0, "flat"),
                }.get(case, (1.0, 0.0, "none"))
                x = np.clip(
                    np.rint(a * img.astype(np.float64) + b), 0, 255
                ).astype(np.uint8)
                out["image_id"].append(iid)
                out["fmt"].append(fmt)
                out["adj"].append(adj)
                out["mean_x100"].append(int(round(float(x.mean()) * 100)))
                out["std_x100"].append(int(round(float(x.std()) * 100)))
            yield pd.DataFrame(out)

    stats = imgs.mapInPandas(
        stats_batches,
        "image_id string, fmt string, adj string, mean_x100 long, std_x100 long",
    )
    stats.write.mode("overwrite").parquet(_M10_MAT)
    mat = spark.read.parquet(_M10_MAT)
    reason = (
        F.when(F.col("mean_x100") < _M10_UNDER, "under_exposed")
        .when(F.col("mean_x100") > _M10_OVER, "over_exposed")
        .when(F.col("std_x100") < _M10_FLAT, "low_contrast")
    )
    return mat.select(
        "image_id",
        "fmt",
        "adj",
        "mean_x100",
        "std_x100",
        reason.alias("reason"),
        reason.isNull().cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# t15 — trained quality classifier (the GPT-3 / PaLM curation shape:
# a cheap linear classifier is trained with the trusted corpus as the
# positive class and junk as the negative class, then its score gates
# what enters training). Positive examples are the documents table;
# negatives are planted junk twins (each doc re-emitted with a fixed
# junk-token tail — the "raw crawl" class, planted identically in
# both engines like d7's near-dups). Features are k=9 hashed
# uni+bigram relative frequencies; the model is a closed-form ridge
# probe solved from ONE row of global sufficient statistics via the
# staged Gaussian elimination shared verbatim with the DuckDB oracle
# (sources/models.gauss_ridge_stages — the v5 machinery, here with a
# single global fit instead of walk-forward weeks). The synthetic
# corpus's unigram distributions barely differ by language (pooled
# hash-bucket features can't express a lang label — measured ~55%),
# so the curated-vs-junk label is also the one that matches the
# published setup.
#
# 100 TB shape: train+apply in two passes over the feature table
# (cached): pass 1 reduces map-side to ONE O(k²) sufficient-stats row
# (no shuffle beyond the final combine), the solve is a driver-sized
# select chain, and apply is a broadcast of the 1-row coefficient
# table against the cached features. The classifier never sees raw
# text twice and nothing iterative happens — normal equations, not
# SGD. The decision threshold is the TRAINING base rate (a linear
# probe's scores center on it), and the prediction compares the
# ROUNDED score to the ROUNDED threshold so both engines branch
# identically.
# ---------------------------------------------------------------------------

_T15_K = 9
_T15_LAM = 1.0
_T15_THR_SQL = "round((csy/cn) + 1e-9, 4)"  # training base rate
_T15_JUNK = " qz9 wkx jvq zzx kqj"  # junk-tail unit (×12 per twin)


def _t15_score_sql() -> str:
    terms = " + ".join(f"b{i}*x{i}" for i in range(1, _T15_K + 1))
    return f"round((b0 + {terms}) + 1e-9, 4)"


def _t15_oracle() -> str:
    from .sources.models import gauss_ridge_sql

    k = _T15_K
    cbuckets = ",\n             ".join(
        f"sum((('0x' || substr(md5(tok), 1, 15))::BIGINT % {k} = {i - 1})::INT)"
        f"::BIGINT AS c{i}"
        for i in range(1, k + 1)
    )
    xcols = ", ".join(f"c{i} / n_tok AS x{i}" for i in range(1, k + 1))
    csx = ", ".join(f"sum(x{i}) AS csx{i}" for i in range(1, k + 1))
    csij = ", ".join(
        f"sum(x{i}*x{j}) AS cs{i}{j}"
        for i in range(1, k + 1)
        for j in range(i, k + 1)
    )
    csy = ", ".join(f"sum(x{i}*y) AS csy{i}" for i in range(1, k + 1))
    gctes, final = gauss_ridge_sql(k, _T15_LAM, src="cum")
    return f"""
    WITH corpus AS (
      SELECT doc_id, 1.0 AS y, text
      FROM documents WHERE length(text) > 0
      UNION ALL
      SELECT doc_id + 6000000, 0.0 AS y,
             text || repeat('{_T15_JUNK}', 12)
      FROM documents WHERE length(text) > 0
    ),
    toks0 AS (
      SELECT doc_id, y, {_TOKENS_SQL} AS tk FROM corpus
    ),
    toks AS (
      SELECT doc_id, y, unnest(tk) AS tok FROM toks0
      UNION ALL
      SELECT doc_id, y, unnest({_tok_ngrams_all_sql("tk", 2)}) AS tok
      FROM toks0
    ),
    feat AS (
      SELECT doc_id, y,
             count(*)::BIGINT AS n_tok,
             {cbuckets}
      FROM toks GROUP BY doc_id, y
    ),
    x AS (
      SELECT doc_id, y, n_tok, {xcols} FROM feat
    ),
    cum AS (
      SELECT count(*)::DOUBLE AS cn, sum(y) AS csy, {csx}, {csij}, {csy}
      FROM x
    ),
    {gctes}
    SELECT d.doc_id, d.y::INT AS label, d.n_tok,
           {_t15_score_sql()} AS score,
           ({_t15_score_sql()} > {_T15_THR_SQL})::INT AS predicted
    FROM x d CROSS JOIN {final}
    """


@query("t15_quality_classifier", oracle=_t15_oracle())
def t15_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge quality classifier: train on hashed-token
    frequencies vs the lang='en' target, score + classify every doc."""
    from .sources.models import gauss_ridge_stages

    k = _T15_K
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(shuffle, "doc_id")  # single-split parquet, see t12
        .select("doc_id", "text")
    )
    corpus = docs.select(
        "doc_id", F.lit(1.0).alias("y"), "text"
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 6000000).alias("doc_id"),
            F.lit(0.0).alias("y"),
            F.concat(
                F.col("text"), F.repeat(F.lit(_T15_JUNK), 12)
            ).alias("text"),
        )
    )
    toks0 = corpus.select("doc_id", "y", tokens(F.col("text")).alias("tk"))
    toks = toks0.select(
        "doc_id",
        "y",
        F.explode(
            F.concat(F.col("tk"), _tok_ngrams_all(F.col("tk"), 2))
        ).alias("tok"),
    )
    b = md5int(F.col("tok")) % k
    feat = toks.groupBy("doc_id", "y").agg(
        F.count("*").alias("n_tok"),
        *[
            F.sum((b == i - 1).cast("int")).alias(f"c{i}")
            for i in range(1, k + 1)
        ],
    )
    # x feeds the stats pass AND the scoring join — cache (fan-out)
    x = feat.select(
        "doc_id",
        "y",
        "n_tok",
        *[
            (F.col(f"c{i}") / F.col("n_tok")).alias(f"x{i}")
            for i in range(1, k + 1)
        ],
    ).cache()
    aggs = [F.count("*").cast("double").alias("cn"), F.sum("y").alias("csy")]
    aggs += [F.sum(f"x{i}").alias(f"csx{i}") for i in range(1, k + 1)]
    for i in range(1, k + 1):
        for j in range(i, k + 1):
            aggs.append(
                F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"cs{i}{j}")
            )
    aggs += [
        F.sum(F.col(f"x{i}") * F.col("y")).alias(f"csy{i}")
        for i in range(1, k + 1)
    ]
    cum = x.agg(*aggs)
    for st in gauss_ridge_stages(k, _T15_LAM):
        cum = cum.select("*", *[F.expr(e).alias(n) for n, e in st.items()])
    coefs = cum.select("cn", "csy", *[f"b{i}" for i in range(0, k + 1)])
    score = F.expr(_t15_score_sql())
    return x.crossJoin(F.broadcast(coefs)).select(
        "doc_id",
        F.col("y").cast("int").alias("label"),
        "n_tok",
        score.alias("score"),
        (score > F.expr(_T15_THR_SQL)).cast("int").alias("predicted"),
    )


# ---------------------------------------------------------------------------
# s6 — product-quantization ANN (Jégou et al. 2011, "Product
# Quantization for Nearest Neighbor Search"): the third scale path
# next to s2's LSH buckets and s4's IVF lists, and the one that
# compresses the corpus itself — each 64-dim vector becomes m=8
# one-byte codes, and probes score candidates through an
# asymmetric-distance (ADC) lookup table without ever touching the
# original vectors.
#
# Probe design: the raw corpus is near-uniform on the sphere (exact
# top-3 L2 neighbors don't even share labels), so raw-corpus recall is
# noise-bound for ANY quantizer; probes are instead planted perturbed
# twins of every 20th vector — the meaningful-similarity case ANN
# exists for — and PQ recovers the source as top-1 for ALL of them
# (recall gate in tests/test_plans.py).
#
# 100 TB shape: codebook training touches only (n·m) subvector rows
# with broadcast m×k centroid dims (the s4 k-means pattern, keyed by
# subspace); encoding is one such assignment; probe scoring joins the
# n×m code table against a probes×m×k lookup table broadcast map-side
# and reduces keyed by (probe, vector) — never an all-pairs distance
# computation, and the scored representation is 8 bytes/vector
# instead of 256. Partial distances are integer-scaled (×1e6) so the
# per-pair sums are exact in both engines; every argmin is decided on
# 6-decimal-rounded distances with centroid-id tiebreaks (the s4
# determinism pattern).
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_D = 8  # dims per subspace (64-dim embeddings)
_PQ_K = 8  # centroids per subspace
_PQ_TOPK = 3
_PQ_EVERY = 20  # plant a perturbed twin of every 20th vector
# deterministic perturbation, same expression text in both engines
_PQ_PERT = "0.02 * ((({i} - 1) % 7) - 3)"


def _l2_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def _pq_assign_sql(sub: str, cents: str) -> str:
    return f"""
      SELECT vec_id, j, sv, cid FROM (
        SELECT s.vec_id, s.j, s.sv, c.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.j
                 ORDER BY round({_l2_sql("s.sv", "c.cv")} + 1e-9, 6), c.cid)
                 AS rk
        FROM {sub} s JOIN {cents} c ON c.j = s.j
      ) WHERE rk = 1
    """


def _pq_recenter_sql(assigned: str) -> str:
    return f"""
      SELECT j, cid, list(m ORDER BY pos) AS cv FROM (
        SELECT j, cid, pos, round(avg(v) + 1e-9, 4) AS m FROM (
          SELECT j, cid, unnest(sv) AS v, generate_subscripts(sv, 1) AS pos
          FROM {assigned}
        ) GROUP BY j, cid, pos
      ) GROUP BY j, cid
    """


def _pq_oracle() -> str:
    pert = _PQ_PERT.format(i="i")
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id + 1000000 AS probe_id, vec_id AS src_id,
             list_transform(generate_series(1, len(e)),
                            i -> e[i] + {pert}) AS e
      FROM base WHERE vec_id % {_PQ_EVERY} = 0
    ),
    sub AS (
      SELECT vec_id, j, e[(j * {_PQ_D} + 1):(j * {_PQ_D} + {_PQ_D})] AS sv
      FROM base, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS j)
    ),
    c0 AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < {_PQ_K}),
    a1 AS ({_pq_assign_sql("sub", "c0")}),
    c1 AS ({_pq_recenter_sql("a1")}),
    a2 AS ({_pq_assign_sql("sub", "c1")}),
    c2 AS ({_pq_recenter_sql("a2")}),
    codes AS (
      SELECT vec_id, j, cid AS code FROM ({_pq_assign_sql("sub", "c2")})
    ),
    psub AS (
      SELECT probe_id, j,
             e[(j * {_PQ_D} + 1):(j * {_PQ_D} + {_PQ_D})] AS sv
      FROM probes, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS j)
    ),
    lut AS (
      SELECT p.probe_id, c.j, c.cid,
             CAST(round({_l2_sql("p.sv", "c.cv")} * 1000000.0 + 1e-9, 0)
                  AS BIGINT) AS pd_x1e6
      FROM psub p JOIN c2 c ON c.j = p.j
    ),
    adc AS (
      SELECT l.probe_id, x.vec_id AS neighbor_id, sum(l.pd_x1e6) AS d_x1e6
      FROM codes x JOIN lut l ON l.j = x.j AND l.cid = x.code
      GROUP BY l.probe_id, x.vec_id
    )
    SELECT probe_id, neighbor_id,
           round(d_x1e6 / 1000000.0 + 1e-9, 4) AS approx_dist
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
        ORDER BY d_x1e6, neighbor_id) AS rk
      FROM adc
    ) WHERE rk <= {_PQ_TOPK}
    """


def _pq_l2(a, b):
    """Left-fold L2² — same fold order and IEEE ops as _l2_sql."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _pq_sub(df: DataFrame, idcol: str) -> DataFrame:
    """(id, e) → (id, j, sv) — one row per subspace slice."""
    slices = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.slice("e", j * _PQ_D + 1, _PQ_D).alias("sv"),
            )
            for j in range(_PQ_M)
        ]
    )
    return df.select(idcol, F.explode(slices).alias("s")).select(
        idcol, F.col("s.j").alias("j"), F.col("s.sv").alias("sv")
    )


def _pq_assign(sub: DataFrame, cents: DataFrame, idcol: str = "vec_id") -> DataFrame:
    s, c = sub.alias("s"), F.broadcast(cents).alias("c")
    d = _pq_l2(F.col("s.sv"), F.col("c.cv"))
    w = Window.partitionBy(idcol, F.col("s.j")).orderBy(
        F.round(d + F.lit(1e-9), 6), F.col("cid")
    )
    return (
        s.join(c, F.col("s.j") == F.col("c.j"))
        .select(idcol, F.col("s.j").alias("j"), "sv", "cid",
                F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == 1)
        .select(idcol, "j", "sv", "cid")
    )


def _pq_recenter(assigned: DataFrame) -> DataFrame:
    exploded = assigned.select("j", "cid", F.posexplode("sv").alias("pos", "v"))
    means = exploded.groupBy("j", "cid", "pos").agg(
        F.round(F.avg("v") + F.lit(1e-9), 4).alias("m")
    )
    return means.groupBy("j", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
        ).alias("cv")
    )


@query("s6_pq_ann", oracle=_pq_oracle())
def s6_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate NN: m=8×k=8 subspace codebooks (2 Lloyd
    iterations, first-K seeds — the oracle's pinned deterministic
    setting), corpus encoded to 8 codes/vector, planted perturbed-twin
    probes scored via integer-scaled lookup tables, top-3 per probe."""
    from .operators.veccluster import adc_sum, codes_as_array, flat_lut, pq_fast_assign, pq_fast_recenter

    # spread the training/encode work off the 1-6 parquet input splits
    # (guide §2.5: input skew — every per-row stage below would
    # otherwise run ≤6-wide at any core count)
    par = spark.sparkContext.defaultParallelism
    base = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        .repartition(par)
    )
    pert_i = F.expr(f"transform(sequence(1, {_PQ_M * _PQ_D}), i -> "
                    f"element_at(e, i) + {_PQ_PERT.format(i='i')})")
    probes = base.filter(F.col("vec_id") % _PQ_EVERY == 0).select(
        (F.col("vec_id") + 1000000).alias("probe_id"),
        pert_i.alias("e"),
    )
    # sub feeds every training iteration + the final encode — cache
    sub = _pq_sub(base, "vec_id").cache()
    cents = sub.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), "j", F.col("sv").alias("cv")
    )
    for _ in range(2):
        cents = pq_fast_recenter(pq_fast_assign(sub, cents, _pq_l2), _PQ_D)
    # cents feeds BOTH the encode and the lookup table — cache, or the
    # whole training tree re-runs per branch (fan-out trap)
    cents = cents.cache()
    codes = pq_fast_assign(sub, cents, _pq_l2).select(
        "vec_id", "j", F.col("cid").alias("code")
    )
    psub = _pq_sub(probes, "probe_id")
    p, c = psub.alias("p"), F.broadcast(cents).alias("c")
    lut = p.join(c, F.col("p.j") == F.col("c.j")).select(
        "probe_id",
        F.col("c.j").alias("j"),
        "cid",
        F.round(_pq_l2(F.col("p.sv"), F.col("c.cv")) * 1000000.0 + F.lit(1e-9), 0)
        .cast("long")
        .alias("pd_x1e6"),
    )
    # r07 ADC restructure (guide §2.3): the old shape joined every code
    # row to every probe's LUT on (j, code) — probes × corpus × m rows —
    # then hash-aggregated the m partial distances per (probe, neighbor)
    # pair (20M-group aggregate at sf1.0, the query's entire cost). Now
    # each vector's m codes ride in ONE array row, each probe's LUT is a
    # flat m·k-slot array, the probe×corpus pairing happens exactly once
    # via an equi-join on the j=0 code, and the ADC distance is an
    # inline 8-term integer sum (order-free ⇒ bit-identical d_x1e6).
    # the code-array aggregate is ~n small rows, so AQE coalesces its
    # shuffle to 1-2 partitions — but the join below fans each row out
    # ×probes (20M rows at sf1.0). Re-spread explicitly or the whole
    # ADC scan + topk sort runs nearly single-task (guide §2.5).
    carr = codes_as_array(codes, _PQ_M).repartition(par)
    lutf = flat_lut(lut, _PQ_M, _PQ_K)
    # j=0 LUT slice: one row per (probe, possible j0-code) — the
    # pairing key. Every probe has exactly one row per code value, so
    # neighbor ⋈ build on code0 yields each (neighbor, probe) pair once.
    build = (
        lut.filter(F.col("j") == 0)
        .select("probe_id", F.col("cid").alias("code0"))
        .join(lutf, "probe_id")
    )
    adc = (
        carr.join(
            F.broadcast(build),
            F.element_at("code_arr", 1).cast("long") == F.col("code0"),
        )
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            adc_sum(F.col("code_arr"), F.col("lut_flat"), _PQ_M, _PQ_K).alias(
                "d_x1e6"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("d_x1e6", "neighbor_id")
    return (
        adc.select("*", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select(
            "probe_id",
            "neighbor_id",
            F.round(F.col("d_x1e6") / 1000000.0 + F.lit(1e-9), 4).alias(
                "approx_dist"
            ),
        )
    )
