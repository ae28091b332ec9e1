"""Per-stage oracle queries over the REAL 6-stage ETL pipeline
(housing_crawler_spark/etl.py ← reference ads_table_processing.py).

Each query synthesizes the same deterministic raw crawl table from
``orders`` on both engines (CASE label picks over the key — labels drawn
from the reference's actual German value domains), pushes it through
stages 1..N of etl.py on the Spark side, and re-expresses those stages'
semantics as independent SQL on the DuckDB side. Between them,
tests/test_golden_etl_full.py (row-exact on the reference's shipped
month) and these six oracles pin the pipeline from both directions:
golden data proves fidelity to the reference, the oracles prove
cross-engine correctness of every rule family at sf scale.

Float discipline: the synthetic sizes are divisors of 100 so every
price/size quotient has ≤2 decimals and the reference's HALF_EVEN
2-decimal rounding is the identity on both engines; everything else
goes through the ±1e-9-then-round-4 convention (queries.py docstring).
±inf (pandas x/0) is mapped to the sentinel -1 in final SELECTs because
the driver's row canon cannot represent it — both engines must agree on
WHICH rows are infinite to match.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import etl
from .queries import load, query

# ---------------------------------------------------------------------------
# the synthetic raw crawl table (same rows on both engines)
# ---------------------------------------------------------------------------

_SIZES = [4, 10, 20, 25, 50, 100]
_FLOORS = ["EG", "1. OG", "2. OG", "3. OG", "4. OG", "5. OG",
           "höher als 5. OG", "Hochparterre", "Dachgeschoss", "Tiefparterre",
           "Keller", "unbekanntes Stockwerk", None]
_ENERGY = [
    None,
    "Verbrauchsausweis, Baujahr 1990, V: 120kW h/(m²a), Energieeffizienzklasse C, Gas",
    "Bedarfsausweis, Fernwärme-Dampft",
    "Baujahr 2005, Erdgas leicht",
    "Energieeffizienzklasse A+, Öl",
    "Solar, V: 85kW h/(m²a)",
]
_AGE_RANGE = [None, "ab 20 Jahren", "bis 35 Jahre", "20 bis 40 Jahre",
              "16 bis 99 Jahre", "10 bis 17 Jahre"]
_GENDER = [None, "Egal", "Frau ab 25 Jahren", "Mann bis 40 Jahre",
           "Divers zwischen 20 und 35 Jahren", "Frauen zwischen 25 und 30 Jahren"]
_FURNITURE = [None, "möbliert", "teilmöbliert", "möbliert, teilmöbliert", "karamell"]
_KITCHEN = [None, "Nicht vorhanden", "Küchenmitbenutzung", "Kochnische",
            "Eigene Küche", "Einbauküche"]
_SMOKING = [None, "Rauchen nicht erwünscht", "Rauchen auf dem Balkon erlaubt",
            "Rauchen im Zimmer erlaubt", "Rauchen überall erlaubt"]
_SHOWER = [None, "Eigenes Bad, Badewanne", "Badmitbenutzung, Dusche",
           "Nicht vorhanden", "Dusche, Badewanne"]
_TV = [None, "Kabel", "Satellit", "Kabel, Satellit"]
_FLOOR_TYPE = [None, "Parkett, Fußbodenheizung", "Dielen, Laminat, Teppich",
               "Fliesen, PVC"]
_HEATING = [None, "Zentralheizung", "Ofenheizung", "Fernwärme"]
_PARKING = [None, "gute Parkmöglichkeiten", "Tiefgaragenstellplatz"]
_BTYPE = [None, "Altbau", "Neubau"]
_INTERNET = [None, "DSL 50-100 Mbit/s", "DSL, WLAN schneller als 100 Mbit/s",
             "Flatrate 1-3 Mbit/s", "WLAN 26-50 Mbit/s"]
_LANGS = [None, "Deutsch", "Deutsch, Englisch", "Englisch, Spanisch, Französisch"]
_EXTRAS = [None, "Waschmaschine, Balkon", "Gartenmitbenutzung, Keller",
           "Terrasse, Garten, Fahrradkeller"]
_WG_TYPE = [None, "Studenten-WG, gemischte WG", "Business-WG",
            "WG mit Kindern, LGBTQIA+", "WG-Neugründung, keine Zweck-WG"]
_OFFERS = ["WG Zimmer in Mitte", "1 Zimmer Wohnung", "2 Zimmer Wohnung Wohnungen",
           "Haus zur Miete", "Gewerbefläche"]
_DETAILS = ["False", None, "1.0", "0", "True", "True", "True", "True", "True"]


def _sql_pick(vals, mod_expr: str) -> str:
    branches = " ".join(
        f"WHEN {i} THEN " + ("NULL" if v is None else f"'{v}'")
        for i, v in enumerate(vals)
    )
    return f"CASE {mod_expr} % {len(vals)} {branches} END"


def _df_pick(vals, mod_col):
    expr = F.when(F.lit(False), F.lit(None))
    for i, v in enumerate(vals):
        expr = expr.when(mod_col % len(vals) == i, F.lit(v))
    return expr.otherwise(F.lit(None))


_RAW_SQL = f"""
raw0 AS (
  SELECT o_orderkey AS id, o_orderdate::DATE AS od,
         CAST(floor(o_totalprice / 200) AS INT) AS price_euros,
         {_sql_pick([str(s) for s in _SIZES], "o_orderkey")}::INT AS size_sqm,
         CAST(1 + o_orderkey % 6 AS INT) AS capacity
  FROM orders
),
raw AS (
  SELECT id, price_euros, size_sqm, capacity,
    {_sql_pick(_OFFERS, "id")} AS type_offer,
    CASE id % 7 WHEN 0 THEN NULL WHEN 1 THEN 0
                ELSE capacity * size_sqm END AS home_total_size,
    CASE id % 4 WHEN 0 THEN NULL WHEN 1 THEN price_euros + 100
                ELSE CAST(floor(price_euros * 0.75) AS INT) END AS cold_rent_euros,
    CASE id % 2 WHEN 0 THEN strftime(od, '%d.%m.%Y')
                ELSE strftime(od, '%Y-%m-%d') END AS published_on,
    CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id % 24 AS INT) END AS published_at,
    CASE id % 3 WHEN 0 THEN NULL ELSE strftime(od + 14, '%d.%m.%Y') END AS available_from,
    CASE id % 5 WHEN 0 THEN NULL ELSE strftime(od + 20 + CAST(id % 600 AS INT), '%d.%m.%Y') END AS available_to,
    {_sql_pick(_DETAILS, "id")} AS details_searched,
    {_sql_pick(["Private", "VerifiziertesUnternehmen", "s"], "id")} AS commercial_landlord,
    {_sql_pick(_AGE_RANGE, "id")} AS age_range,
    {_sql_pick(_GENDER, "id")} AS gender_search,
    {_sql_pick(_ENERGY, "id")} AS energy,
    CASE id % 3 WHEN 0 THEN 'Ja' ELSE NULL END AS wg_possible,
    CASE id % 2 WHEN 0 THEN 'SCHUFA erwünscht' ELSE NULL END AS schufa_needed,
    {_sql_pick(_FLOORS, "id")} AS building_floor,
    {_sql_pick(_FURNITURE, "id")} AS furniture,
    {_sql_pick(_KITCHEN, "id")} AS kitchen,
    {_sql_pick(_SMOKING, "id")} AS smoking,
    {_sql_pick(_SHOWER, "id")} AS shower_type,
    {_sql_pick(_TV, "id")} AS tv,
    {_sql_pick(_FLOOR_TYPE, "id")} AS floor_type,
    {_sql_pick(_HEATING, "id")} AS heating,
    {_sql_pick(_PARKING, "id")} AS parking,
    {_sql_pick(_BTYPE, "id")} AS building_type,
    CASE id % 4 WHEN 0 THEN NULL
                ELSE concat(CAST(1 + id % 30 AS INT), ' Minuten') END AS public_transport_distance,
    {_sql_pick(_INTERNET, "id")} AS internet,
    {_sql_pick(_LANGS, "id")} AS languages,
    {_sql_pick(_EXTRAS, "id")} AS extras,
    {_sql_pick(_WG_TYPE, "id")} AS wg_type,
    40.0 + (id % 20) AS latitude,
    0.8 * (id % 25) AS longitude,
    CASE id % 3 WHEN 0 THEN NULL ELSE CAST(id % 250 AS DOUBLE) END AS transfer_costs_euros,
    CASE id % 5 WHEN 1 THEN NULL ELSE CAST(id % 120 AS DOUBLE) END AS extra_costs_euros,
    CASE id % 7 WHEN 2 THEN NULL ELSE CAST(id % 300 AS DOUBLE) END AS mandatory_costs_euros,
    CASE id % 4 WHEN 3 THEN NULL ELSE CAST((id % 20) * 100 AS DOUBLE) END AS deposit
  FROM raw0
)
"""


def _raw_ads_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r07: the orders parquet has 1-2 row groups, so the whole ad
    # synthesis + 6-stage expression chain ran ≤2-wide at any core
    # count (guide §2.5 input skew). One keyless round-robin spread of
    # the 3 source columns (~45 MB at sf1.0) buys full parallelism for
    # every downstream per-row stage; the chain stays shuffle-free
    # after it (round-robin, not hash — test_etl_chain still asserts
    # no hashpartitioning and a single scan).
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    o = load(spark, sf_dir, "orders").repartition(shuffle)
    return build_raw_ads(
        o,
        F.col("o_orderkey"),
        F.col("o_orderdate").cast("date"),
        F.floor(F.col("o_totalprice") / 200).cast("int"),
    )


def build_raw_ads(
    src: DataFrame,
    k: Column,
    od: Column,
    price: Column,
    lat: Column | None = None,
    lon: Column | None = None,
) -> DataFrame:
    """Deterministic raw-ads table from any keyed source: every ad
    attribute is a pure function of (k, od, price) over the reference's
    actual German value domains. Two call sites: the per-stage oracles
    build it from ``orders`` (k = o_orderkey), and ads_bridge builds it
    from the crawl store's detail fetch log (k = xxhash64(url) with the
    sign bit masked — the full 2^63 non-negative domain) — the
    synth-world stand-in for the reference's BeautifulSoup parse of the
    fetched detail page. ``k`` must be a non-negative integral column
    (negative % would make every pick NULL)."""
    size = _df_pick([str(s) for s in _SIZES], k).cast("int")
    capacity = (1 + k % 6).cast("int")
    dmy = lambda c: F.date_format(c, "dd.MM.yyyy")  # noqa: E731
    return src.select(
        k.alias("id"),
        price.alias("price_euros"),
        size.alias("size_sqm"),
        capacity.alias("WG_size"),  # exercises prepare_data's rename map
        _df_pick(_OFFERS, k).alias("type_offer"),
        F.when(k % 7 == 0, F.lit(None))
        .when(k % 7 == 1, F.lit(0))
        .otherwise(capacity * size)
        .alias("home_total_size"),
        F.when(k % 4 == 0, F.lit(None))
        .when(k % 4 == 1, price + 100)
        .otherwise(F.floor(price * 0.75).cast("int"))
        .alias("cold_rent_euros"),
        F.when(k % 2 == 0, dmy(od))
        .otherwise(F.date_format(od, "yyyy-MM-dd"))
        .alias("published_on"),
        F.when(k % 11 == 0, F.lit(None)).otherwise((k % 24).cast("int")).alias("published_at"),
        F.when(k % 3 == 0, F.lit(None)).otherwise(dmy(F.date_add(od, 14))).alias("available from"),
        F.when(k % 5 == 0, F.lit(None))
        .otherwise(dmy(F.date_add(od, (20 + k % 600).cast("int"))))
        .alias("available to"),
        _df_pick(_DETAILS, k).alias("details_searched"),
        _df_pick(["Private", "VerifiziertesUnternehmen", "s"], k).alias("landlord_type"),
        _df_pick(_AGE_RANGE, k).alias("age_range"),
        _df_pick(_GENDER, k).alias("gender_search"),
        _df_pick(_ENERGY, k).alias("energy"),
        F.when(k % 3 == 0, "Ja").alias("wg_possible"),
        F.when(k % 2 == 0, "SCHUFA erwünscht").alias("Schufa_needed"),
        _df_pick(_FLOORS, k).alias("building_floor"),
        _df_pick(_FURNITURE, k).alias("furniture"),
        _df_pick(_KITCHEN, k).alias("kitchen"),
        _df_pick(_SMOKING, k).alias("smoking"),
        _df_pick(_SHOWER, k).alias("shower_type"),
        _df_pick(_TV, k).alias("TV"),
        _df_pick(_FLOOR_TYPE, k).alias("floor_type"),
        _df_pick(_HEATING, k).alias("heating"),
        _df_pick(_PARKING, k).alias("parking"),
        _df_pick(_BTYPE, k).alias("building_type"),
        F.when(k % 4 == 0, F.lit(None))
        .otherwise(F.concat((1 + k % 30).cast("string"), F.lit(" Minuten")))
        .alias("public_transport_distance"),
        _df_pick(_INTERNET, k).alias("internet"),
        _df_pick(_LANGS, k).alias("languages"),
        _df_pick(_EXTRAS, k).alias("extras"),
        _df_pick(_WG_TYPE, k).alias("wg_type"),
        (lat if lat is not None else F.lit(40.0) + (k % 20)).alias("latitude"),
        (lon if lon is not None else F.lit(0.8) * (k % 25)).alias("longitude"),
        F.when(k % 3 == 0, F.lit(None)).otherwise((k % 250).cast("double")).alias("transfer_costs_euros"),
        F.when(k % 5 == 1, F.lit(None)).otherwise((k % 120).cast("double")).alias("extra_costs_euros"),
        F.when(k % 7 == 2, F.lit(None)).otherwise((k % 300).cast("double")).alias("mandatory_costs_euros"),
        F.when(k % 4 == 3, F.lit(None)).otherwise(((k % 20) * 100).cast("double")).alias("deposit"),
    )


# ---------------------------------------------------------------------------
# SQL twins of the stages (DuckDB side)
# ---------------------------------------------------------------------------

_HEAT_SQL = " ".join(
    f"WHEN contains(energy, '{n}') THEN '{label}'" for n, label in etl.HEAT_SOURCE_CHAIN
)
_SPEED_SQL = " ".join(
    f"WHEN contains(internet, '{n}') THEN {v}" for n, v in etl.INTERNET_SPEED_CHAIN
)
_TOILET_SQL = (
    "WHEN contains(shower_type, 'Eigenes Bad') THEN 1.0 "
    "WHEN contains(shower_type, 'Badmitbenutzung') THEN 0.5 "
    "WHEN contains(shower_type, 'Nicht vorhanden') THEN 0.0"
)
_FLOOR_SQL = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in etl.FLOOR_MAP.items()
)
_CLASS_SQL = " ".join(f"WHEN '{k}' THEN {v}" for k, v in etl.ENERGY_CLASS_MAP.items())

_S1_SQL = r"""
s1 AS (
  SELECT id, price_euros, size_sqm, capacity, home_total_size,
    latitude, longitude,
    transfer_costs_euros, extra_costs_euros, mandatory_costs_euros, deposit,
    furniture, kitchen, smoking, shower_type, tv, floor_type, heating,
    parking, building_type, internet, languages, extras, wg_type,
    wg_possible AS wg_possible_raw, schufa_needed AS schufa_needed_raw,
    building_floor AS building_floor_raw,
    public_transport_distance AS pt_raw,
    CASE WHEN contains(published_on, '.') THEN strptime(published_on, '%d.%m.%Y')::DATE
         ELSE strptime(published_on, '%Y-%m-%d')::DATE END AS published_on,
    published_at,
    strptime(available_from, '%d.%m.%Y')::DATE AS available_from,
    strptime(available_to, '%d.%m.%Y')::DATE AS available_to,
    CASE WHEN details_searched IS NULL THEN 0
         WHEN lower(details_searched) IN ('true','1','1.0') THEN 1
         WHEN lower(details_searched) IN ('false','0','0.0') THEN 0
         ELSE coalesce(CAST(try_cast(details_searched AS DOUBLE) AS INT), 0) END AS ds,
    CASE WHEN contains(type_offer, '1 Zimmer Wohnung') THEN 'Single-room flat'
         WHEN contains(type_offer, 'Zimmer Wohnung') THEN 'Apartment'
         WHEN contains(type_offer, 'WG') THEN 'WG'
         WHEN contains(type_offer, 'Haus') THEN 'House'
         ELSE type_offer END AS type_offer_simple,
    CASE WHEN cold_rent_euros < price_euros THEN cold_rent_euros END AS cold_rent_euros,
    CASE WHEN age_range IS NULL OR starts_with(age_range, 'bis') THEN NULL
         ELSE CAST(regexp_extract_all(age_range, '[0-9]+')[1] AS DOUBLE) END AS min_age_flatmates,
    CASE WHEN age_range IS NULL OR starts_with(age_range, 'ab') THEN NULL
         WHEN starts_with(age_range, 'bis')
           THEN CAST(regexp_extract_all(age_range, '[0-9]+')[1] AS DOUBLE)
         ELSE CAST(regexp_extract_all(age_range, '[0-9]+')[2] AS DOUBLE) END AS max_age_flatmates,
    CASE WHEN gender_search IS NULL THEN 'Egal'
         WHEN contains(gender_search, 'Divers') THEN 'Divers'
         WHEN contains(gender_search, 'Frau') THEN 'Frau'
         WHEN contains(gender_search, 'Mann') THEN 'Mann'
         ELSE 'Egal' END AS gender_searched_pre,
    CASE WHEN gender_search IS NULL OR contains(gender_search, 'bis') THEN 0.0
         WHEN contains(gender_search, 'zwischen')
           THEN CAST(list_min(regexp_extract_all(gender_search, '[0-9]+')) AS DOUBLE)
         WHEN contains(gender_search, 'ab')
           THEN CAST(regexp_extract_all(gender_search, '[0-9]+')[1] AS DOUBLE)
         ELSE 0.0 END AS min_age_searched_pre,
    CASE WHEN gender_search IS NULL OR contains(gender_search, 'ab') THEN 99.0
         WHEN contains(gender_search, 'zwischen')
           THEN CAST(list_max(regexp_extract_all(gender_search, '[0-9]+')) AS DOUBLE)
         WHEN contains(gender_search, 'bis')
           THEN CAST(regexp_extract_all(gender_search, '[0-9]+')[1] AS DOUBLE)
         ELSE 99.0 END AS max_age_searched_pre,
    CAST(nullif(regexp_extract(energy, 'Baujahr (\d+)', 1), '') AS DOUBLE) AS construction_year_pre,
    CASE WHEN contains(energy, 'Verbrauchsausweis') THEN 'Verbrauchsausweis'
         WHEN contains(energy, 'Bedarfsausweis') THEN 'Bedarfsausweis' END AS energy_certificate_pre,
    CAST(nullif(regexp_extract(energy, 'V: (\d+)kW h/', 1), '') AS DOUBLE) AS energy_usage_pre,
    nullif(regexp_extract(energy, 'Energieeffizienzklasse ([^,]+)', 1), '') AS energy_class_letter,
    CASE __HEAT__ END AS heating_energy_source_pre,
    CASE commercial_landlord WHEN 's' THEN 'Verifiziert'
         WHEN 'VerifiziertesUnternehmen' THEN 'Verifiziert'
         ELSE commercial_landlord END AS commercial_landlord_lbl
  FROM raw
  WHERE CASE WHEN contains(type_offer, '1 Zimmer Wohnung') THEN 'Single-room flat'
             WHEN contains(type_offer, 'Zimmer Wohnung') THEN 'Apartment'
             WHEN contains(type_offer, 'WG') THEN 'WG'
             WHEN contains(type_offer, 'Haus') THEN 'House'
             ELSE type_offer END IN ('WG', 'Single-room flat', 'Apartment')
),
s1n AS (
  SELECT *,
    CASE WHEN ds = 0 THEN NULL ELSE gender_searched_pre END AS gender_searched,
    CASE WHEN ds = 0 THEN NULL ELSE min_age_searched_pre END AS min_age_searched,
    CASE WHEN ds = 0 THEN NULL ELSE max_age_searched_pre END AS max_age_searched,
    CASE WHEN ds = 0 THEN NULL ELSE construction_year_pre END AS construction_year,
    CASE WHEN ds = 0 THEN NULL ELSE energy_certificate_pre END AS energy_certificate,
    CASE WHEN ds = 0 THEN NULL ELSE energy_usage_pre END AS energy_usage,
    CASE WHEN ds = 0 THEN NULL ELSE energy_class_letter END AS energy_efficiency_class_letter,
    CASE WHEN ds = 0 THEN NULL ELSE heating_energy_source_pre END AS heating_energy_source
  FROM s1
)
""".replace("__HEAT__", _HEAT_SQL)

_PDIV = (
    "CASE WHEN {n} IS NULL OR {d} IS NULL THEN NULL "
    "WHEN {d} = 0 AND {n} > 0 THEN 'infinity'::DOUBLE "
    "WHEN {d} = 0 AND {n} < 0 THEN '-infinity'::DOUBLE "
    "WHEN {d} = 0 THEN NULL "
    "ELSE {n} * 1.0 / {d} END"
)

_S2_SQL = f"""
s2 AS (
  SELECT *,
    CASE WHEN type_offer_simple = 'WG'
         THEN {_PDIV.format(n="(price_euros * capacity)", d="home_total_size")}
         ELSE round(cold_rent_euros * 1.0 / size_sqm, 2) END AS price_per_sqm_warm,
    CASE WHEN type_offer_simple = 'WG'
         THEN {_PDIV.format(n="(cold_rent_euros * capacity)", d="home_total_size")}
         ELSE round(cold_rent_euros * 1.0 / size_sqm, 2) END AS price_per_sqm_cold,
    CASE WHEN latitude > 47.3024876979 AND latitude < 54.983104153
         THEN latitude END AS lat2,
    CASE WHEN longitude > 5.98865807458 AND longitude < 15.0169958839
         THEN longitude END AS lon2
  FROM s1n
  WHERE (type_offer_simple = 'WG' AND price_euros BETWEEN 50 AND 2000
         AND size_sqm BETWEEN 5 AND 60)
     OR (type_offer_simple = 'Single-room flat' AND price_euros BETWEEN 100 AND 2500
         AND size_sqm BETWEEN 10 AND 100)
     OR (type_offer_simple = 'Apartment' AND price_euros BETWEEN 200 AND 6000
         AND size_sqm BETWEEN 25 AND 300)
)
"""

_S3_SQL = f"""
s3 AS (
  SELECT *,
    CASE WHEN type_offer_simple = 'WG' THEN 1.0
         WHEN ds = 0 THEN NULL
         WHEN wg_possible_raw IS NULL THEN 0.0 ELSE 1.0 END AS wg_possible,
    CASE WHEN ds = 0 THEN NULL
         WHEN schufa_needed_raw IS NULL THEN 0.0 ELSE 1.0 END AS schufa_needed,
    CASE commercial_landlord_lbl WHEN 'Private' THEN 0.0
         WHEN 'Verifiziert' THEN 1.0 END AS commercial_landlord,
    CASE energy_efficiency_class_letter {_CLASS_SQL} END AS energy_efficiency_class,
    CASE building_floor_raw {_FLOOR_SQL} END AS building_floor,
    CAST(string_split(pt_raw, ' Min')[1] AS DOUBLE) AS public_transport_distance,
    CASE WHEN languages IS NULL THEN 1.0
         ELSE CAST(len(string_split(languages, ',')) AS DOUBLE) END AS number_languages,
    CASE WHEN ds = 0 THEN NULL ELSE (CASE {_SPEED_SQL} END) END AS internet_speed,
    CASE WHEN ds = 0 THEN NULL ELSE (CASE {_TOILET_SQL} END) END AS toilet
  FROM s2
)
"""


def _mh_sql(cat: str, term: str) -> str:
    name = etl.multihot_name(cat, term)
    return (
        f"CASE WHEN {cat} IS NOT NULL AND contains({cat}, '{term}') THEN 1.0 "
        f"WHEN ds = 1 THEN 0.0 END AS {name}"
    )


_S4_TERMS = [
    ("internet", "DSL"), ("internet", "WLAN"), ("internet", "Flatrate"),
    ("shower_type", "Badewanne"), ("shower_type", "Dusche"),
    ("floor_type", "Parkett"), ("floor_type", "Fußbodenheizung"),
    ("extras", "Garten"), ("extras", "Gartenmitbenutzung"),
    ("extras", "Keller"), ("extras", "Fahrradkeller"),
    ("languages", "Deutsch"), ("languages", "Englisch"),
    ("wg_type", "Studenten-WG"), ("wg_type", "WG mit Kindern"),
    ("wg_type", "keine Zweck-WG"), ("wg_type", "WG-Neugründung"),
    ("wg_type", "LGBTQIA+"),
    ("tv", "Kabel"), ("tv", "Satellit"),
]
_S4_SQL = "s4 AS (\n  SELECT *,\n    " + ",\n    ".join(
    _mh_sql(c, t) for c, t in _S4_TERMS
) + "\n  FROM s3\n)"

_TERM_SQL = (
    "CASE WHEN days_available <= 30 THEN '30days' "
    "WHEN days_available <= 90 THEN '90days' "
    "WHEN days_available <= 180 THEN '180days' "
    "WHEN days_available <= 270 THEN '270days' "
    "WHEN days_available < 365 THEN '365days' "
    "WHEN days_available < 540 THEN '540days' "
    "ELSE 'plus540days' END"
)
_BUCKET = (
    "CASE WHEN {x} < 20 THEN '20' WHEN {x} < 30 THEN '30' "
    "WHEN {x} < 40 THEN '40' WHEN {x} < 60 THEN '60' ELSE '100' END"
)

_S5_SQL = f"""
s5a AS (
  SELECT *,
    date_diff('day', DATE '2022-01-01', published_on) AS days_since_2022,
    left(dayname(published_on), 3) AS day_of_week_publication,
    CASE WHEN available_to IS NULL THEN 730
         ELSE date_diff('day', coalesce(available_from, published_on), available_to)
         END AS days_available,
    CASE WHEN ds = 0 THEN NULL ELSE (CASE furniture
         WHEN 'möbliert' THEN 1.0 WHEN 'teilmöbliert' THEN 0.5
         WHEN 'möbliert, teilmöbliert' THEN 0.5 ELSE 0.0 END) END AS furniture_numerical,
    CASE WHEN ds = 0 THEN NULL ELSE (CASE kitchen
         WHEN 'Nicht vorhanden' THEN 0.0 WHEN 'Küchenmitbenutzung' THEN 0.5
         WHEN 'Kochnische' THEN 0.75 WHEN 'Eigene Küche' THEN 1.0
         WHEN 'Einbauküche' THEN 1.0 ELSE 0.0 END) END AS kitchen_numerical,
    CASE WHEN ds = 0 THEN NULL ELSE (CASE smoking
         WHEN 'Rauchen nicht erwünscht' THEN 0.0
         WHEN 'Rauchen auf dem Balkon erlaubt' THEN 0.5
         WHEN 'Rauchen im Zimmer erlaubt' THEN 0.75
         WHEN 'Rauchen überall erlaubt' THEN 1.0 ELSE 0.0 END) END AS smoking_numerical,
    concat({_BUCKET.format(x="min_age_searched")}, '_',
           {_BUCKET.format(x="max_age_searched")}) AS age_category_searched,
    {_PDIV.format(n="size_sqm", d="home_total_size")} AS room_size_house_fraction,
    CASE WHEN min_age_flatmates < 18 THEN 1.0 ELSE 0.0 END AS flat_with_kids,
    CASE WHEN max_age_flatmates < 18 OR max_age_flatmates > 80 THEN NULL
         ELSE max_age_flatmates END AS max_age_flatmates2,
    CASE WHEN min_age_flatmates < 18 OR min_age_flatmates > 80 THEN NULL
         ELSE min_age_flatmates END AS min_age_flatmates2
  FROM s4
),
s5 AS (
  SELECT *, {_TERM_SQL} AS rental_length_term,
    CASE day_of_week_publication WHEN 'Mon' THEN 1 WHEN 'Tue' THEN 2
         WHEN 'Wed' THEN 3 WHEN 'Thu' THEN 4 WHEN 'Fri' THEN 5
         WHEN 'Sat' THEN 6 WHEN 'Sun' THEN 7 END AS day_week_int
  FROM s5a
  WHERE (room_size_house_fraction <= 0.7 OR room_size_house_fraction IS NULL)
    AND lat2 IS NOT NULL AND lon2 IS NOT NULL AND lat2 > 0 AND lon2 > 0
)
"""

_S6_SQL = """
s6 AS (
  SELECT *,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(transfer_costs_euros, 0.0) END AS transfer_costs_euros2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(extra_costs_euros, 0.0) END AS extra_costs_euros2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(mandatory_costs_euros, 0.0) END AS mandatory_costs_euros2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(deposit, 0.0) END AS deposit2,
    CASE WHEN ds = 0 THEN NULL
         WHEN number_languages IS NULL THEN 1.0 ELSE languages_deutsch END AS languages_deutsch2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(number_languages, 0.0) END AS number_languages2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(energy_certificate, 'no_answer') END AS energy_certificate2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(heating_energy_source, 'no_answer') END AS heating_energy_source2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(heating, 'no_answer') END AS heating2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(parking, 'no_answer') END AS parking2,
    CASE WHEN ds = 0 THEN NULL ELSE coalesce(building_type, 'no_answer') END AS building_type2
  FROM s5
)
"""


def _with(*stages: str) -> str:
    return "WITH " + ",\n".join([_RAW_SQL.strip().rstrip(",")] + [s.strip().strip(",") for s in stages])


# Spark-side stage chains -----------------------------------------------------


def _s1(spark, sf_dir):
    return etl.prepare_data(_raw_ads_df(spark, sf_dir))


def _s2(spark, sf_dir):
    return etl.filter_out_bad_entries(_s1(spark, sf_dir))


def _s3(spark, sf_dir):
    return etl.transform_columns_into_numerical(_s2(spark, sf_dir))


def _s4(spark, sf_dir):
    return etl.split_cat_columns(_s3(spark, sf_dir))


def _s5(spark, sf_dir):
    return etl.feature_engineering(_s4(spark, sf_dir), grid=None)


def _s6(spark, sf_dir):
    return etl.imputing_values(_s5(spark, sf_dir))


# ---------------------------------------------------------------------------
# the six oracle queries
# ---------------------------------------------------------------------------


@query(
    "etl1_prepare",
    oracle=_with(_S1_SQL)
    + """
    SELECT id, type_offer_simple, cold_rent_euros, ds AS details_searched,
           strftime(published_on, '%Y-%m-%d') AS published_on_str,
           min_age_flatmates, max_age_flatmates,
           gender_searched, min_age_searched, max_age_searched,
           construction_year, energy_certificate, energy_usage,
           energy_efficiency_class_letter AS energy_efficiency_class,
           heating_energy_source,
           commercial_landlord_lbl AS commercial_landlord
    FROM s1n
    """,
)
def etl1_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL stage 1 (reference ads_table_processing.py:19-224): renames,
    dual-format date parsing, type_offer simplification + group drop,
    cold-rent sanity NULL, age/gender parsing (incl. the reference's
    lexicographic min/max over regex matches), 17-branch energy
    decomposition, unsearched re-nulls."""
    return _s1(spark, sf_dir).select(
        "id",
        "type_offer_simple",
        "cold_rent_euros",
        "details_searched",
        F.date_format("published_on", "yyyy-MM-dd").alias("published_on_str"),
        "min_age_flatmates",
        "max_age_flatmates",
        "gender_searched",
        "min_age_searched",
        "max_age_searched",
        "construction_year",
        "energy_certificate",
        "energy_usage",
        "energy_efficiency_class",
        "heating_energy_source",
        "commercial_landlord",
    )


_INF_GUARD = "CASE WHEN isinf({x}) THEN -1.0 ELSE round({x} + 1e-9, 4) END"


@query(
    "etl2_filter",
    oracle=_with(_S1_SQL, _S2_SQL)
    + f"""
    SELECT id, type_offer_simple,
           {_INF_GUARD.format(x="price_per_sqm_warm")} AS ppsqm_warm,
           {_INF_GUARD.format(x="price_per_sqm_cold")} AS ppsqm_cold,
           lat2 AS latitude, lon2 AS longitude
    FROM s2
    """,
)
def etl2_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL stage 2 (:226-360): per-type price/size keep rules, €/m² with
    the WG capacity quirks and pandas x/0→inf semantics (inf mapped to
    the -1 sentinel on both engines — the driver canon can't hash inf),
    Germany bbox → NULL coords."""
    out = _s2(spark, sf_dir)

    def guard(c):
        col = F.col(c)
        return F.when(col == F.lit(etl.INF), -1.0).otherwise(
            F.round(col + F.lit(1e-9), 4)
        )

    return out.select(
        "id",
        "type_offer_simple",
        guard("price_per_sqm_warm").alias("ppsqm_warm"),
        guard("price_per_sqm_cold").alias("ppsqm_cold"),
        "latitude",
        "longitude",
    )


@query(
    "etl3_numerical",
    oracle=_with(_S1_SQL, _S2_SQL, _S3_SQL)
    + """
    SELECT id, wg_possible, schufa_needed, commercial_landlord,
           energy_efficiency_class, building_floor,
           public_transport_distance, number_languages, internet_speed,
           toilet
    FROM s3
    """,
)
def etl3_numerical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL stage 3 (:362-465): label→ordinal maps (floor incl.
    fractional Hochparterre/Tiefparterre, energy class H..A+→1..9,
    internet speed 1..7, toilet), answer-presence encodings with the
    WG-override-last rule, language count."""
    return _s3(spark, sf_dir).select(
        "id",
        "wg_possible",
        "schufa_needed",
        "commercial_landlord",
        "energy_efficiency_class",
        "building_floor",
        "public_transport_distance",
        "number_languages",
        "internet_speed",
        "toilet",
    )


@query(
    "etl4_split",
    oracle=_with(_S1_SQL, _S2_SQL, _S3_SQL, _S4_SQL)
    + "\n    SELECT id, "
    + ", ".join(etl.multihot_name(c, t) for c, t in _S4_TERMS)
    + "\n    FROM s4",
)
def etl4_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL stage 4 (:467-533): comma-joined categoricals → multi-hots
    with SUBSTRING semantics ('Garten' fires inside 'Gartenmitbenutzung')
    and the reference's column-name cleaning; NULL where details were
    never fetched."""
    names = [etl.multihot_name(c, t) for c, t in _S4_TERMS]
    return _s4(spark, sf_dir).select("id", *names)


@query(
    "etl5_features",
    oracle=_with(_S1_SQL, _S2_SQL, _S3_SQL, _S4_SQL, _S5_SQL)
    + """
    SELECT id, days_since_2022, day_of_week_publication, days_available,
           rental_length_term, furniture_numerical, kitchen_numerical,
           smoking_numerical, age_category_searched,
           round(room_size_house_fraction + 1e-9, 4) AS room_fraction,
           flat_with_kids,
           min_age_flatmates2 AS min_age_flatmates,
           max_age_flatmates2 AS max_age_flatmates,
           round(sin(2 * pi() * published_at / 24) + 1e-9, 4) AS sin_published_at,
           round(cos(2 * pi() * day_week_int / 7) + 1e-9, 4) AS cos_day_week_int
    FROM s5
    """,
)
def etl5_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL stage 5 (:547-704): date/availability features, rental-term
    buckets, numeric encodings, age-category concat, room-fraction
    outlier filter (inf drops, NULL keeps), flatmate-age clamps,
    coordinate filter, polar transforms."""
    out = _s5(spark, sf_dir)
    return out.select(
        "id",
        "days_since_2022",
        "day_of_week_publication",
        "days_available",
        "rental_length_term",
        "furniture_numerical",
        "kitchen_numerical",
        "smoking_numerical",
        "age_category_searched",
        F.round(F.col("room_size_house_fraction") + F.lit(1e-9), 4).alias("room_fraction"),
        "flat_with_kids",
        "min_age_flatmates",
        "max_age_flatmates",
        F.round(F.col("sin_published_at") + F.lit(1e-9), 4).alias("sin_published_at"),
        F.round(F.col("cos_day_week_int") + F.lit(1e-9), 4).alias("cos_day_week_int"),
    )


@query(
    "etl6_impute",
    oracle=_with(_S1_SQL, _S2_SQL, _S3_SQL, _S4_SQL, _S5_SQL, _S6_SQL)
    + """
    SELECT id, transfer_costs_euros2 AS transfer_costs_euros,
           extra_costs_euros2 AS extra_costs_euros,
           mandatory_costs_euros2 AS mandatory_costs_euros,
           deposit2 AS deposit,
           languages_deutsch2 AS languages_deutsch,
           number_languages2 AS number_languages,
           energy_certificate2 AS energy_certificate,
           heating_energy_source2 AS heating_energy_source,
           heating2 AS heating, parking2 AS parking,
           building_type2 AS building_type
    FROM s6
    """,
)
def etl6_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL stage 6 (:706-783): fill-then-re-null imputation — zeros for
    unanswered costs, 'no_answer' for unanswered categoricals, German
    assumed where no languages listed, NULL everywhere details were
    never fetched. Full 6-stage chain end-to-end."""
    return _s6(spark, sf_dir).select(
        "id",
        "transfer_costs_euros",
        "extra_costs_euros",
        "mandatory_costs_euros",
        "deposit",
        "languages_deutsch",
        "number_languages",
        "energy_certificate",
        "heating_energy_source",
        "heating",
        "parking",
        "building_type",
    )
