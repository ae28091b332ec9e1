"""The reference's 6-stage ETL pipeline semantics
(ads_table_processing.py:785-807 process_ads_tables) re-expressed as
native Spark plans and verified against DuckDB.

The driver tables carry no housing ads, so each query first *derives* a
deterministic ads-like table from ``orders``/``customer`` inside the
query (same CASE mapping on both engines — keys → German labels drawn
from the reference's actual label domains), then applies the
transformation under test. This exercises exactly the per-row ``.apply``
lambdas the reference uses (SURVEY §2.10: ~60 of them) as WHEN-chains /
regexp / date arithmetic — zero Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import load, query

# label domains lifted from the reference's classifier inputs
# (ads_table_processing.py:200-220 heating, :437-446 internet,
#  :584-607 smoking/kitchen/furniture, :488-531 multi-hot terms)
_HEATING = [
    "Zentralheizung",
    "Gasheizung",
    "Ofenheizung",
    "Fernwärme",
    "Nachtspeicherofen",
    "Etagenheizung",
    "kein Angabe",
]
_INTERNET = [
    "DSL 16-25 Mbit/s",
    "DSL 50-100 Mbit/s",
    "DSL mehr als 100 Mbit/s",
    "WLAN 26-50 Mbit/s",
    "kein Internet",
]
_LANGS = ["Deutsch", "Englisch", "Spanisch", "Französisch"]


def _ads_sql() -> str:
    """orders → ads-like rows (same derivation both engines)."""
    heat = " ".join(
        f"WHEN {i} THEN '{lbl}'" for i, lbl in enumerate(_HEATING)
    )
    net = " ".join(f"WHEN {i} THEN '{lbl}'" for i, lbl in enumerate(_INTERNET))
    return f"""
      SELECT o_orderkey AS id,
             CAST(floor(o_totalprice / 100) AS INT) AS price_euros,
             CAST(floor(o_totalprice / 5000) AS INT) + 8 AS size_sqm,
             CASE (o_orderkey % {len(_HEATING)}) {heat} END AS heating,
             CASE (o_orderkey % {len(_INTERNET)}) {net} END AS internet,
             CASE o_orderkey % 4
               WHEN 0 THEN 'Deutsch'
               WHEN 1 THEN 'Deutsch, Englisch'
               WHEN 2 THEN 'Englisch, Spanisch, Französisch'
               ELSE '' END AS languages,
             o_orderdate AS published_on,
             CAST(o_orderkey % 24 AS INT) AS published_at,
             (o_orderkey % 7) != 0 AS details_searched
      FROM orders
    """


def _ads_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    heat = F.when(F.lit(False), "")
    for i, lbl in enumerate(_HEATING):
        heat = heat.when(k % len(_HEATING) == i, lbl)
    net = F.when(F.lit(False), "")
    for i, lbl in enumerate(_INTERNET):
        net = net.when(k % len(_INTERNET) == i, lbl)
    langs = (
        F.when(k % 4 == 0, "Deutsch")
        .when(k % 4 == 1, "Deutsch, Englisch")
        .when(k % 4 == 2, "Englisch, Spanisch, Französisch")
        .otherwise("")
    )
    return o.select(
        k.alias("id"),
        # NB: explicit floor — DuckDB CAST(double AS INT) rounds, Spark truncates
        F.floor(F.col("o_totalprice") / 100).cast("int").alias("price_euros"),
        (F.floor(F.col("o_totalprice") / 5000).cast("int") + 8).alias("size_sqm"),
        heat.alias("heating"),
        net.alias("internet"),
        langs.alias("languages"),
        F.col("o_orderdate").alias("published_on"),
        (k % 24).cast("int").alias("published_at"),
        (k % 7 != 0).alias("details_searched"),
    )


@query(
    "e1_classify_when_chains",
    oracle=f"""
    SELECT id,
           CASE
             WHEN contains(heating, 'Zentral') THEN 'central'
             WHEN contains(heating, 'Gas') THEN 'gas'
             WHEN contains(heating, 'Ofen') OR contains(heating, 'ofen') THEN 'stove'
             WHEN contains(heating, 'Fernwärme') THEN 'district'
             WHEN contains(heating, 'Etagen') THEN 'floor'
             ELSE 'unknown'
           END AS heating_class,
           CASE
             WHEN contains(internet, 'mehr als 100') THEN 100
             WHEN contains(internet, '50-100') THEN 75
             WHEN contains(internet, '26-50') THEN 38
             WHEN contains(internet, '16-25') THEN 20
             ELSE 0
           END AS internet_mbits
    FROM ({_ads_sql()})
    """,
)
def e1_classify_when_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """German-label → category WHEN-chains (reference heating classifier
    ads_table_processing.py:200-220, internet speed :437-446 — per-row
    lambdas there, one codegen'd CASE expression here)."""
    ads = _ads_df(spark, sf_dir)
    h = F.col("heating")
    heating_class = (
        F.when(h.contains("Zentral"), "central")
        .when(h.contains("Gas"), "gas")
        .when(h.contains("Ofen") | h.contains("ofen"), "stove")
        .when(h.contains("Fernwärme"), "district")
        .when(h.contains("Etagen"), "floor")
        .otherwise("unknown")
    )
    n = F.col("internet")
    mbits = (
        F.when(n.contains("mehr als 100"), 100)
        .when(n.contains("50-100"), 75)
        .when(n.contains("26-50"), 38)
        .when(n.contains("16-25"), 20)
        .otherwise(0)
    )
    return ads.select(
        "id", heating_class.alias("heating_class"), mbits.alias("internet_mbits")
    )


@query(
    "e2_multihot_split",
    oracle=f"""
    SELECT id,
           CASE WHEN list_contains(string_split(languages, ', '), 'Deutsch')
                THEN 1 ELSE 0 END AS lang_deutsch,
           CASE WHEN list_contains(string_split(languages, ', '), 'Englisch')
                THEN 1 ELSE 0 END AS lang_englisch,
           CASE WHEN list_contains(string_split(languages, ', '), 'Spanisch')
                THEN 1 ELSE 0 END AS lang_spanisch,
           CASE WHEN list_contains(string_split(languages, ', '), 'Französisch')
                THEN 1 ELSE 0 END AS lang_franzoesisch,
           len(list_filter(string_split(languages, ', '), x -> length(x) > 0))
             AS n_langs
    FROM ({_ads_sql()})
    """,
)
def e2_multihot_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-joined multi-valued string → multi-hot ints (reference
    splits `languages`/`wg_type` by substring tests,
    ads_table_processing.py:467-531; here: split once, array_contains)."""
    ads = _ads_df(spark, sf_dir)
    arr = F.split(F.col("languages"), ", ")
    cols = [
        F.when(F.array_contains(arr, lang), 1)
        .otherwise(0)
        .alias(f"lang_{alias}")
        for lang, alias in zip(
            _LANGS, ["deutsch", "englisch", "spanisch", "franzoesisch"]
        )
    ]
    n_langs = F.size(F.filter(arr, lambda x: F.length(x) > 0))
    return ads.select("id", *cols, n_langs.alias("n_langs"))


@query(
    "e3_date_features",
    oracle=f"""
    SELECT id,
           date_diff('day', DATE '2022-01-01', published_on) AS days_since_2022,
           round((sin(2 * pi() * published_at / 24)) + 1e-9, 4) AS sin_published_at,
           round((cos(2 * pi() * published_at / 24)) + 1e-9, 4) AS cos_published_at,
           dayofweek(published_on) + 1 AS dow,
           round((price_euros::DOUBLE / size_sqm) + 1e-9, 4) AS price_per_sqm
    FROM ({_ads_sql()})
    """,
)
def e3_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engineered features: days-since-epoch, sin/cos hour encoding,
    weekday, price-per-sqm ratio (reference feature_engineering,
    ads_table_processing.py:547-704, esp. :677-702 polar encodings)."""
    import math

    ads = _ads_df(spark, sf_dir)
    two_pi = 2 * math.pi
    return ads.select(
        "id",
        F.datediff(F.col("published_on").cast("date"), F.lit("2022-01-01").cast("date")).alias(
            "days_since_2022"
        ),
        F.round((F.sin(F.lit(two_pi) * F.col("published_at") / 24)) + F.lit(1e-9), 4).alias(
            "sin_published_at"
        ),
        F.round((F.cos(F.lit(two_pi) * F.col("published_at") / 24)) + F.lit(1e-9), 4).alias(
            "cos_published_at"
        ),
        F.dayofweek("published_on").alias("dow"),
        F.round((F.col("price_euros").cast("double") / F.col("size_sqm")) + F.lit(1e-9), 4).alias(
            "price_per_sqm"
        ),
    )


@query(
    "e4_imputation",
    oracle=f"""
    SELECT id,
           CASE WHEN NOT details_searched THEN NULL
                ELSE coalesce(internet, 'no_answer') END AS internet_imputed,
           CASE WHEN NOT details_searched THEN NULL
                WHEN price_euros IS NULL THEN 0
                ELSE price_euros END AS price_imputed
    FROM ({_ads_sql()})
    """,
)
def e4_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Imputation with the reference's twist: fill defaults, then re-null
    every detail column where details were never fetched
    (ads_table_processing.py:706-783 imputing_values)."""
    ads = _ads_df(spark, sf_dir)
    ds = F.col("details_searched")
    return ads.select(
        "id",
        F.when(~ds, None)
        .otherwise(F.coalesce(F.col("internet"), F.lit("no_answer")))
        .alias("internet_imputed"),
        F.when(~ds, None)
        .otherwise(F.coalesce(F.col("price_euros"), F.lit(0)))
        .alias("price_imputed"),
    )


# "X Minuten/Stunden/Tage ago" label → publication timestamp, with the
# reference's midnight rollover (crawl_wggesucht.py:391-428 and its twin
# utils.py:527-562): minutes/seconds → capture hour, hours → capture
# hour minus diff (negative wraps to the previous day), days → capture
# date minus diff with NULL hour, absolute "am DD.MM.YYYY" → parsed
# date with NULL hour.
_REL_LABEL_SQL = """
    CASE event_id % 5
      WHEN 0 THEN concat(1 + event_id % 59, ' Minuten')
      WHEN 1 THEN concat(1 + event_id % 23, ' Stunden')
      WHEN 2 THEN concat(1 + event_id % 5, ' Tagen')
      WHEN 3 THEN concat('am ', strftime(ts::DATE - 40, '%d.%m.%Y'))
      ELSE concat(event_id % 60, ' Sekunden')
    END
"""


@query(
    "e6_relative_time",
    oracle=f"""
    WITH lbl AS (
      SELECT event_id, ts, {_REL_LABEL_SQL} AS published_label
      FROM events
    ), resolved AS (
    SELECT event_id, published_label,
           CASE
             WHEN published_label LIKE '%Minut%' OR published_label LIKE '%Sekund%'
               THEN ts::DATE
             WHEN published_label LIKE '%Stund%' THEN
               CASE WHEN hour(ts) - CAST(regexp_extract(published_label, '[0-9]+') AS INT) < 0
                    THEN ts::DATE - 1 ELSE ts::DATE END
             WHEN published_label LIKE '%Tag%'
               THEN ts::DATE - CAST(regexp_extract(published_label, '[0-9]+') AS INT)
             ELSE strptime(string_split(published_label, ' ')[2], '%d.%m.%Y')::DATE
           END AS pub_date_d,
           CASE
             WHEN published_label LIKE '%Minut%' OR published_label LIKE '%Sekund%'
               THEN CAST(hour(ts) AS INT)
             WHEN published_label LIKE '%Stund%' THEN
               CAST(CASE WHEN hour(ts) - CAST(regexp_extract(published_label, '[0-9]+') AS INT) < 0
                    THEN hour(ts) - CAST(regexp_extract(published_label, '[0-9]+') AS INT) + 24
                    ELSE hour(ts) - CAST(regexp_extract(published_label, '[0-9]+') AS INT) END AS INT)
             ELSE NULL
           END AS pub_hour
    FROM lbl
    )
    SELECT event_id, published_label,
           strftime(pub_date_d, '%Y-%m-%d') AS pub_date, pub_hour
    FROM resolved
    """,
)
def e6_relative_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-publication-time reconstruction (SURVEY §2.8 date/time;
    reference crawl_wggesucht.py:391-428 / utils.py:527-562): 'X
    Minuten/Stunden/Tage' → (date, hour) against the capture timestamp,
    hours wrapping across midnight, days/absolute labels → NULL hour.
    One when-chain, no Python."""
    ev = load(spark, sf_dir, "events")
    k = F.col("event_id")
    label = (
        F.when(k % 5 == 0, F.concat((1 + k % 59).cast("string"), F.lit(" Minuten")))
        .when(k % 5 == 1, F.concat((1 + k % 23).cast("string"), F.lit(" Stunden")))
        .when(k % 5 == 2, F.concat((1 + k % 5).cast("string"), F.lit(" Tagen")))
        .when(
            k % 5 == 3,
            F.concat(
                F.lit("am "),
                F.date_format(F.date_sub(F.col("ts").cast("date"), 40), "dd.MM.yyyy"),
            ),
        )
        .otherwise(F.concat((k % 60).cast("string"), F.lit(" Sekunden")))
    )
    lbl = ev.select("event_id", "ts", label.alias("published_label"))
    p = F.col("published_label")
    diff = F.regexp_extract(p, "[0-9]+", 0).cast("int")
    cap_date = F.col("ts").cast("date")
    cap_hour = F.hour("ts")
    is_now = p.contains("Minut") | p.contains("Sekund")
    rolled = cap_hour - diff < 0
    pub_date = (
        F.when(is_now, cap_date)
        .when(p.contains("Stund"), F.when(rolled, F.date_sub(cap_date, 1)).otherwise(cap_date))
        .when(p.contains("Tag"), F.date_sub(cap_date, diff))
        .otherwise(F.to_date(F.element_at(F.split(p, " "), 2), "dd.MM.yyyy"))
    )
    pub_hour = (
        F.when(is_now, cap_hour)
        .when(
            p.contains("Stund"),
            F.when(rolled, cap_hour - diff + 24).otherwise(cap_hour - diff),
        )
        .otherwise(F.lit(None))
        .cast("int")
    )
    return lbl.select(
        "event_id",
        "published_label",
        # emit the date as a canonical string: engines disagree on how a
        # DATE cell stringifies (DuckDB promotes to midnight timestamps)
        F.date_format(pub_date, "yyyy-MM-dd").alias("pub_date"),
        pub_hour.alias("pub_hour"),
    )


# DuckDB has no initcap; per-word capitalize via a list lambda
_CAP_WORD = "concat(upper({w}[1]), lower({w}[2:]))"
_CAP_ALL = (
    "list_aggr(list_transform(string_split({e}, ' '), "
    "w -> concat(upper(w[1]), lower(w[2:]))), 'string_agg', ' ')"
)


def _sql_german_chars(e: str) -> str:
    restored = f"replace(replace(replace(replace({e}, '_', ' '), 'ae', 'ä'), 'oe', 'ö'), 'ue', 'ü')"
    return (
        f"CASE WHEN lower({restored}) = 'düsseldorf' THEN {restored} "
        f"ELSE replace({restored}, 'ss', 'ß') END"
    )


def _sql_capitalize_city(e: str) -> str:
    cap1 = _CAP_WORD.format(w=f"string_split({e}, ' ')[1]")
    cap3 = _CAP_WORD.format(w=f"string_split({e}, ' ')[3]")
    mid = f"string_split({e}, ' ')[2]"
    return (
        f"CASE WHEN len(string_split({e}, ' ')) = 3 "
        f"THEN concat({cap1}, ' ', {mid}, ' ', {cap3}) "
        f"ELSE {_CAP_ALL.format(e=e)} END"
    )


_CITY_KEYS = [
    "berlin",
    "muenchen",
    "stuttgart",
    "koeln",
    "duesseldorf",
    "frankfurt_am_main",
    "goettingen",
    "muenster",
    "nuernberg",
    "tuebingen",
    "wuerzburg",
    "rio_de_janeiro",
]


_E7_CITY_CASE = " ".join(f"WHEN {i} THEN '{c}'" for i, c in enumerate(_CITY_KEYS))
_E7_STREET = _CAP_ALL.format(
    e="trim(regexp_extract(string_split(address, ',')[1], '(\\D+)', 1))"
)
_E7_HOUSE = "regexp_extract(string_split(address, ',')[1], '(\\d+)', 1)"
_E7_NEIGH = _CAP_ALL.format(
    e="array_to_string(string_split(string_split(address, ',')[2], ' ')[3:], ' ')"
)
_E7_CITY = _CAP_WORD.format(w="string_split(string_split(address, ',')[2], ' ')[2]")


@query(
    "e7_city_normalize",
    oracle=f"""
    WITH src AS (
      SELECT c_custkey,
             CASE c_custkey % {len(_CITY_KEYS)}
               {_E7_CITY_CASE}
             END AS city_key,
             concat('hauptstr ', 1 + c_custkey % 200, ', berlin mitte west')
               AS address
      FROM customer
    ),
    restored AS (
      SELECT c_custkey, city_key,
             {_sql_german_chars("city_key")} AS city_restored, address
      FROM src
    )
    SELECT c_custkey, city_key,
           {_sql_capitalize_city("city_restored")} AS city_display,
           trim(replace(replace(replace(concat(
             concat({_E7_STREET}, ' ', {_E7_HOUSE}),
             ', ',
             concat({_E7_NEIGH}, ', ', {_E7_CITY})
           ), 'str ', 'straße '), ' ,', ','), '  ', ' ')) AS address_simple
    FROM restored
    """,
)
def e7_city_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse string normalization family (reference
    string_utils.py:12-68): german_characters (ae→ä with the Düsseldorf
    ss→ß exception), capitalize_city_name's 3-word rule ('Frankfurt am
    Main' keeps 'am' lowercase), and simplify_address — over the
    reference's own city list (params.py:41-67)."""
    from .functions.strings import capitalize_city, german_characters, simplify_address

    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    city_key = F.when(F.lit(False), "")
    for i, name in enumerate(_CITY_KEYS):
        city_key = city_key.when(k % len(_CITY_KEYS) == i, name)
    address = F.concat(
        F.lit("hauptstr "), (1 + k % 200).cast("string"), F.lit(", berlin mitte west")
    )
    src = c.select(
        "c_custkey", city_key.alias("city_key"), address.alias("address")
    )
    restored = german_characters(F.col("city_key"))
    return src.select(
        "c_custkey",
        "city_key",
        capitalize_city(restored).alias("city_display"),
        simplify_address(F.col("address")).alias("address_simple"),
    )


@query(
    "e5_umlaut_normalize",
    oracle=f"""
    SELECT id,
           replace(replace(replace(replace(replace(replace(replace(
             heating, 'ä', 'ae'), 'ö', 'oe'), 'ü', 'ue'),
             'Ä', 'Ae'), 'Ö', 'Oe'), 'Ü', 'Ue'), 'ß', 'ss')
           AS heating_ascii
    FROM ({_ads_sql()})
    """,
)
def e5_umlaut_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Umlaut transliteration (reference string_utils.py:12-17) as a
    replace chain — shared with functions/strings.simplify_umlauts."""
    from .functions.strings import simplify_umlauts

    ads = _ads_df(spark, sf_dir)
    return ads.select("id", simplify_umlauts(F.col("heating")).alias("heating_ascii"))


# ---------------------------------------------------------------------------
# e8 — fix_weird_address: the address-hygiene step the geocode join
# depends on (reference geocoding_addresses.py:10-25)
# ---------------------------------------------------------------------------

# dirty-address templates exercising the weird-pattern strips AND the
# misspelling chain (each template hits different rules)
_DIRTY_ADDRESSES = [
    "Warschschauer Str, 12",
    "Nahe Alexanderplatz, Grunerstrasse 20",
    "Hauptsrasse 5, Berlin",
    "Schonehauser Alle 44",
    "xxx Dunkerstraße 7 xx",
    "Close to Ostkreuz, Reinstraße 3",
    "Koperniskusstraße nummer zwei, Berlin",
    "Borndorfer Str, 9 nähe S Bahnhof",
    "Camebridger Stasse, 15",
    "Neltstraße 2 Nearby Park",
]


def _e8_case_sql() -> str:
    whens = "\n".join(
        f"WHEN {i} THEN '{a}'" for i, a in enumerate(_DIRTY_ADDRESSES)
    )
    return f"CASE c_custkey % {len(_DIRTY_ADDRESSES)}\n{whens}\nEND"


def _e8_oracle() -> str:
    from .functions.strings import fix_weird_address_sql

    return f"""
    WITH src AS (
      SELECT c_custkey, {_e8_case_sql()} AS address_raw
      FROM customer
    )
    SELECT c_custkey, address_raw,
           {fix_weird_address_sql("address_raw")} AS address_fixed
    FROM src
    """


@query("e8_fix_weird_address", oracle=_e8_oracle())
def e8_fix_weird_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address typo-correction chain (reference
    geocoding_addresses.py:10-25 fix_weird_address): strips the weird
    location qualifiers and applies the ~26-entry misspelling replace
    chain as ONE native expression — the hygiene step that precedes the
    g1 geocode dim join. Bug-compatible with the reference's sequential
    str.replace semantics (single-pass space collapse, ordered rules)."""
    from .functions.strings import fix_weird_address

    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    addr = F.when(F.lit(False), "")
    for i, a in enumerate(_DIRTY_ADDRESSES):
        addr = addr.when(k % len(_DIRTY_ADDRESSES) == i, a)
    src = c.select("c_custkey", addr.alias("address_raw"))
    return src.select(
        "c_custkey",
        "address_raw",
        fix_weird_address(F.col("address_raw")).alias("address_fixed"),
    )
