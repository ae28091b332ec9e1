"""The reference's COMPLETE 6-stage batch ETL
(ads_table_processing.py:785-807 ``process_ads_tables``) as one chain of
native Spark stages producing the wide analytics table.

Stage map (reference file:line → function here):

1. ``prepare_data``            (:19-224)   renames, dtypes, type_offer
   simplification, cold-rent sanity, age/gender parsing, the 17-branch
   energy decomposition
2. ``filter_out_bad_entries``  (:226-360)  per-type price/size keep
   rules, price-per-sqm (incl. the reference's WG quirks), Germany
   bbox → NULL coords
3. ``transform_columns_into_numerical`` (:362-465) ordinal/label maps
   (floor, energy class, internet speed, toilet), counts
4. ``split_cat_columns``       (:480-533)  43 multi-hot columns across 7
   comma-joined categorical families (SUBSTRING semantics — 'Garten'
   matches inside 'Gartenmitbenutzung', exactly like the reference)
5. ``feature_engineering``     (:547-704)  date/availability features,
   numeric encodings, outlier handling, the OSM grid spatial join,
   polar transforms
6. ``imputing_values``         (:706-783)  fill-then-re-null: defaults
   where an answer was possible, NULL where details were never fetched

Everything is WHEN-chains / regexp / date arithmetic — zero Python in
the plan. Pandas semantics that Spark's ANSI mode rejects (x/0 → ±inf,
0/0 → NaN-as-null) are reproduced explicitly by ``pdiv``.

Row-exact verification: tests/test_golden_etl_full.py reconstructs the
raw crawl table from the reference's shipped month
(raw_data/202302_ads_OSM.csv, 2,284 rows), runs THIS pipeline on it and
compares every reproducible output column against what the reference's
pandas pipeline actually produced — including the OSM feature columns
for the cities whose 200 m grids ship with the reference.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

INF = float("inf")

# ---------------------------------------------------------------------------
# pandas-faithful helpers
# ---------------------------------------------------------------------------


def pdiv(n: Column, d: Column) -> Column:
    """numpy/pandas float division under Spark ANSI mode: x/0 → ±inf,
    0/0 → NULL (pandas NaN behaves as a null downstream), NULL
    propagates."""
    n = n.cast("double")
    d = d.cast("double")
    return (
        F.when(n.isNull() | d.isNull(), F.lit(None).cast("double"))
        .when((d == 0) & (n > 0), F.lit(INF))
        .when((d == 0) & (n < 0), F.lit(-INF))
        .when(d == 0, F.lit(None).cast("double"))
        .otherwise(n / F.when(d != 0, d))
    )


def _map_chain(col: Column, mapping: dict, default=None) -> Column:
    """pandas ``Series.map(dict)``: exact-match lookup, miss → default."""
    expr = F.when(F.lit(False), F.lit(None))
    for k, v in mapping.items():
        expr = expr.when(col == k, F.lit(v))
    return expr.otherwise(F.lit(default))


def _null_when_unsearched(df: DataFrame, cols: list[str]) -> DataFrame:
    ds0 = F.col("details_searched") == 0
    for c in cols:
        df = df.withColumn(c, F.when(ds0, F.lit(None)).otherwise(F.col(c)))
    return df


# ---------------------------------------------------------------------------
# stage 1 — prepare_data (ads_table_processing.py:19-224)
# ---------------------------------------------------------------------------

RENAMES = {
    "WG_size": "capacity",
    "available from": "available_from",
    "available to": "available_to",
    "Schufa_needed": "schufa_needed",
    "TV": "tv",
    "landlord_type": "commercial_landlord",
}

HEAT_SOURCE_CHAIN = [
    ("Öl", "oil"),
    ("Erdwärme", "geothermal"),
    ("Solar", "solar"),
    ("Holzpellets", "wood pellets"),
    ("Gas", "gas"),
    ("Fernwärme-Dampft", "steam district heating"),
    ("Fernwärme", "distant district heating"),
    ("Kohle/Koks", "coal/coke"),
    ("Kohle", "coal"),
    ("Erdgas leicht", "light natural gas"),
    ("Erdgas schwer", "heavy natural gas"),
    ("Flüssiggas", "LPG"),
    ("Holz", "wood"),
    ("Holz-Hackschnitzel", "wood chips"),
    ("Nahwärme", "local district heating"),
    ("Wärmelieferung", "delivery"),
    ("Strom", "eletricity"),  # the reference's spelling, kept verbatim
]


def _contains_chain(col: Column, pairs: list[tuple[str, str]], default=None) -> Column:
    expr = F.when(F.lit(False), F.lit(None))
    for needle, label in pairs:
        expr = expr.when(col.contains(needle), F.lit(label))
    return expr.otherwise(F.lit(default))


def prepare_data(ads: DataFrame) -> DataFrame:
    for old, new in RENAMES.items():
        if old in ads.columns:
            ads = ads.withColumnRenamed(old, new)

    cl = F.col("commercial_landlord")
    ads = ads.withColumn(
        "commercial_landlord",
        F.when(cl.isin("s", "VerifiziertesUnternehmen"), "Verifiziert").otherwise(cl),
    )

    parse_two = F.coalesce(
        F.try_to_date(F.col("published_on"), "dd.MM.yyyy"),
        F.try_to_date(F.col("published_on"), "yyyy-MM-dd"),
    )
    ads = (
        ads.withColumn("published_at", F.col("published_at").cast("int"))
        .withColumn("published_on", parse_two)
        .withColumn(
            "available_from", F.try_to_date(F.col("available_from"), "dd.MM.yyyy")
        )
        .withColumn(
            "available_to", F.try_to_date(F.col("available_to"), "dd.MM.yyyy")
        )
    )

    ds = F.col("details_searched").cast("string")
    ads = ads.withColumn(
        "details_searched",
        F.when(ds.isNull(), 0)
        .when(F.lower(ds).isin("true", "1", "1.0"), 1)
        .when(F.lower(ds).isin("false", "0", "0.0"), 0)
        .otherwise(F.coalesce(ds.try_cast("double").cast("int"), F.lit(0)))
        .cast("long"),
    )

    # type_offer → type_offer_simple (sequential substring rewrites,
    # :55-59); prepare_data then re-concats ONLY the WG/single/apartment
    # groups, dropping 'House' and anything else (:65-105)
    t = F.col("type_offer")
    t1 = F.when(t.contains("1 Zimmer Wohnung"), "Single-room flat").otherwise(t)
    t2 = F.when(t1.contains("Zimmer Wohnung"), "Apartment").otherwise(t1)
    t3 = F.when(t2.contains("WG"), "WG").otherwise(t2)
    t4 = F.when(t3.contains("Haus"), "House").otherwise(t3)
    ads = ads.withColumn("type_offer_simple", t4).drop("type_offer")
    ads = ads.filter(
        F.col("type_offer_simple").isin("WG", "Single-room flat", "Apartment")
    )

    # cold rent ≥ warm rent is implausible → NULL (:72-82)
    ads = ads.withColumn(
        "cold_rent_euros",
        F.when(F.col("cold_rent_euros") < F.col("price_euros"), F.col("cold_rent_euros")),
    )

    # age_range → min/max flatmate age (:111-125)
    ar = F.col("age_range")
    nums_ar = F.regexp_extract_all(ar, F.lit("([0-9]+)"), 1)
    ads = (
        ads.withColumn(
            "min_age_flatmates",
            F.when(ar.isNull() | ar.startswith("bis"), F.lit(None)).otherwise(
                F.element_at(nums_ar, 1).cast("double")
            ),
        )
        .withColumn(
            "max_age_flatmates",
            F.when(ar.isNull() | ar.startswith("ab"), F.lit(None))
            .when(ar.startswith("bis"), F.element_at(nums_ar, 1).cast("double"))
            .otherwise(F.element_at(nums_ar, 2).cast("double")),
        )
        .drop("age_range")
    )

    # gender_search → gender_searched + min/max age searched (:129-165).
    # NB the reference takes min()/max() over the STRINGS re.findall
    # returns — lexicographic, reproduced by array_min/array_max on the
    # string array.
    gs = F.col("gender_search")
    nums_gs = F.regexp_extract_all(gs, F.lit("([0-9]+)"), 1)
    ads = (
        ads.withColumn(
            "gender_searched",
            F.when(gs.isNull(), "Egal")
            .when(gs.contains("Divers"), "Divers")
            .when(gs.contains("Frau"), "Frau")
            .when(gs.contains("Mann"), "Mann")
            .otherwise("Egal"),
        )
        .withColumn(
            "min_age_searched",
            F.when(gs.isNull() | gs.contains("bis"), F.lit(0.0))
            .when(gs.contains("zwischen"), F.array_min(nums_gs).cast("double"))
            .when(gs.contains("ab"), F.element_at(nums_gs, 1).cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "max_age_searched",
            F.when(gs.isNull() | gs.contains("ab"), F.lit(99.0))
            .when(gs.contains("zwischen"), F.array_max(nums_gs).cast("double"))
            .when(gs.contains("bis"), F.element_at(nums_gs, 1).cast("double"))
            .otherwise(F.lit(99.0)),
        )
        .drop("gender_search")
    )

    # energy → 5 derived columns (:170-222)
    en = F.col("energy")
    ads = (
        ads.withColumn(
            "construction_year",
            F.nullif(F.regexp_extract(en, r"Baujahr (\d+)", 1), F.lit("")).cast("double"),
        )
        .withColumn(
            "energy_certificate",
            F.when(en.contains("Verbrauchsausweis"), "Verbrauchsausweis").when(
                en.contains("Bedarfsausweis"), "Bedarfsausweis"
            ),
        )
        .withColumn(
            "energy_usage",
            F.nullif(F.regexp_extract(en, r"V: (\d+)kW h/", 1), F.lit("")).cast("double"),
        )
        .withColumn(
            "energy_efficiency_class",
            F.nullif(F.regexp_extract(en, r"Energieeffizienzklasse ([^,]+)", 1), F.lit("")),
        )
        .withColumn("heating_energy_source", _contains_chain(en, HEAT_SOURCE_CHAIN))
        .drop("energy")
    )

    return _null_when_unsearched(
        ads,
        [
            "gender_searched",
            "min_age_searched",
            "max_age_searched",
            "construction_year",
            "energy_certificate",
            "energy_usage",
            "energy_efficiency_class",
            "heating_energy_source",
        ],
    )


# ---------------------------------------------------------------------------
# stage 2 — filter_out_bad_entries (:226-360)
# ---------------------------------------------------------------------------

KEEP_RULES = {
    "WG": (50, 2000, 5, 60),
    "Single-room flat": (100, 2500, 10, 100),
    "Apartment": (200, 6000, 25, 300),
}
GERMANY_BBOX = (47.3024876979, 54.983104153, 5.98865807458, 15.0169958839)


def filter_out_bad_entries(ads: DataFrame, country: str = "Germany") -> DataFrame:
    price, size, typ = F.col("price_euros"), F.col("size_sqm"), F.col("type_offer_simple")
    keep = F.lit(False)
    for t, (plo, phi, slo, shi) in KEEP_RULES.items():
        keep = keep | (
            (typ == t)
            & price.between(plo, phi)
            & size.between(slo, shi)
        )
    ads = ads.filter(keep)

    # €/m² (:283-298): pandas round() is HALF_EVEN → bround. The
    # reference's quirk chain ends with: WG rows get the UNROUNDED
    # capacity formula for both warm and cold; everything else gets the
    # rounded COLD value for both.
    cold_rounded = F.bround(
        F.col("cold_rent_euros").cast("double") / size.cast("double"), 2
    )
    is_wg = typ == "WG"
    wg_warm = pdiv(price * F.col("capacity"), F.col("home_total_size"))
    wg_cold = pdiv(F.col("cold_rent_euros") * F.col("capacity"), F.col("home_total_size"))
    ads = ads.withColumn(
        "price_per_sqm_warm", F.when(is_wg, wg_warm).otherwise(cold_rounded)
    ).withColumn("price_per_sqm_cold", F.when(is_wg, wg_cold).otherwise(cold_rounded))

    if country.lower() in ("germany", "de"):
        lat_lo, lat_hi, lon_lo, lon_hi = GERMANY_BBOX
        lat, lon = F.col("latitude"), F.col("longitude")
        ads = ads.withColumn(
            "latitude", F.when((lat > lat_lo) & (lat < lat_hi), lat)
        ).withColumn("longitude", F.when((lon > lon_lo) & (lon < lon_hi), lon))
    return ads


# ---------------------------------------------------------------------------
# stage 3 — transform_columns_into_numerical (:362-465)
# ---------------------------------------------------------------------------

FLOOR_MAP = {
    "EG": 0.0,
    "1. OG": 1.0,
    "2. OG": 2.0,
    "3. OG": 3.0,
    "4. OG": 4.0,
    "5. OG": 5.0,
    "höher als 5. OG": 6.0,
    "Hochparterre": 0.5,
    "Dachgeschoss": 2.0,
    "Tiefparterre": -0.5,
    "Keller": -1.0,
}
ENERGY_CLASS_MAP = {
    "H": 1.0, "G": 2.0, "F": 3.0, "E": 4.0, "D": 5.0, "C": 6.0, "B": 7.0,
    "A": 8.0, "A+": 9.0,
}
INTERNET_SPEED_CHAIN = [
    ("langsamer als 10 Mbit/s", 1.0),
    ("1-3 Mbit/s", 1.0),
    ("7-10 Mbit/s", 2.0),
    ("11-16 Mbit/s", 3.0),
    ("17-25 Mbit/s", 4.0),
    ("26-50 Mbit/s", 5.0),
    ("50-100 Mbit/s", 6.0),
    ("schneller als 100 Mbit/s", 7.0),
]
TOILET_CHAIN = [("Eigenes Bad", 1.0), ("Badmitbenutzung", 0.5), ("Nicht vorhanden", 0.0)]


def transform_columns_into_numerical(ads: DataFrame) -> DataFrame:
    ds0 = F.col("details_searched") == 0

    # wg_possible: answer→1, silence→0, unsearched→NULL, then WG
    # offers are 1 by definition (:371-373 — the WG override is LAST,
    # so it wins even over the unsearched NULL)
    wgp = F.when(F.col("wg_possible").isNull(), 0.0).otherwise(1.0)
    wgp = F.when(ds0, F.lit(None)).otherwise(wgp)
    ads = ads.withColumn(
        "wg_possible",
        F.when(F.col("type_offer_simple") == "WG", 1.0).otherwise(wgp),
    )

    sch = F.when(F.col("schufa_needed").isNull(), 0.0).otherwise(1.0)
    ads = ads.withColumn("schufa_needed", F.when(ds0, F.lit(None)).otherwise(sch))

    ads = ads.withColumn(
        "commercial_landlord",
        _map_chain(F.col("commercial_landlord"), {"Private": 0.0, "Verifiziert": 1.0}),
    )
    ads = ads.withColumn(
        "energy_efficiency_class",
        _map_chain(F.col("energy_efficiency_class"), ENERGY_CLASS_MAP),
    )
    ads = ads.withColumn("building_floor", _map_chain(F.col("building_floor"), FLOOR_MAP))

    ads = ads.withColumn(
        "public_transport_distance",
        F.split(F.col("public_transport_distance"), " Min").getItem(0).cast("double"),
    )
    ads = ads.withColumn(
        "number_languages",
        F.when(F.col("languages").isNull(), 1.0).otherwise(
            F.size(F.split(F.col("languages"), ",")).cast("double")
        ),
    )
    spd = _contains_chain(
        F.col("internet"), [(k, str(v)) for k, v in INTERNET_SPEED_CHAIN]
    ).cast("double")
    ads = ads.withColumn("internet_speed", F.when(ds0, F.lit(None)).otherwise(spd))
    toi = _contains_chain(
        F.col("shower_type"), [(k, str(v)) for k, v in TOILET_CHAIN]
    ).cast("double")
    ads = ads.withColumn("toilet", F.when(ds0, F.lit(None)).otherwise(toi))
    return ads


# ---------------------------------------------------------------------------
# stage 4 — split_cat_columns (:467-533)
# ---------------------------------------------------------------------------

SPLIT_FAMILIES: dict[str, list[str]] = {
    "internet": ["DSL", "WLAN", "Flatrate"],
    "shower_type": ["Badewanne", "Dusche"],
    "floor_type": [
        "Dielen", "Parkett", "Laminat", "Teppich", "Fliesen", "PVC",
        "Fußbodenheizung",
    ],
    "extras": [
        "Waschmaschine", "Spülmaschine", "Terrasse", "Balkon", "Garten",
        "Gartenmitbenutzung", "Keller", "Aufzug", "Haustiere",
        "Fahrradkeller", "Dachboden",
    ],
    "languages": ["Deutsch", "Englisch"],
    "wg_type": [
        "Studenten-WG", "keine Zweck-WG", "Männer-WG", "Business-WG",
        "Wohnheim", "Vegetarisch/Vegan", "Alleinerziehende",
        "funktionale WG", "Berufstätigen-WG", "gemischte WG",
        "WG mit Kindern", "Verbindung", "LGBTQIA+", "Senioren-WG",
        "inklusive WG", "WG-Neugründung",
    ],
    "tv": ["Kabel", "Satellit"],
}


def multihot_name(cat: str, term: str) -> str:
    """The reference's column-name cleaning (:470-471), verbatim."""
    t = (
        term.lower()
        .replace("ü", "ue")
        .replace("-wg", "")
        .replace(" wg", "")
        .replace("wg ", "")
        .replace("ä", "ae")
        .replace(" ", "_")
        .replace("/", "_")
        .replace("-", "_")
        .replace("+", "")
    )
    return f"{cat}_{t}"


def split_cat_columns(ads: DataFrame) -> DataFrame:
    ds1 = F.col("details_searched") == 1
    cols = []
    for cat, terms in SPLIT_FAMILIES.items():
        src = F.col(cat)
        for term in terms:
            # SUBSTRING match, like the reference's `term in item` —
            # 'Garten' intentionally also fires on 'Gartenmitbenutzung'
            cols.append(
                F.when(src.isNotNull() & src.contains(term), 1.0)
                .when(ds1, 0.0)
                .alias(multihot_name(cat, term))
            )
    keep = [c for c in ads.columns if c not in SPLIT_FAMILIES]
    return ads.select(*keep, *cols)


# ---------------------------------------------------------------------------
# stage 5 — feature_engineering (:547-704)
# ---------------------------------------------------------------------------

FURNITURE_MAP = {"möbliert": 1.0, "teilmöbliert": 0.5, "möbliert, teilmöbliert": 0.5}
KITCHEN_MAP = {
    "Nicht vorhanden": 0.0, "Küchenmitbenutzung": 0.5, "Kochnische": 0.75,
    "Eigene Küche": 1.0, "Einbauküche": 1.0,
}
SMOKING_MAP = {
    "Rauchen nicht erwünscht": 0.0, "Rauchen auf dem Balkon erlaubt": 0.5,
    "Rauchen im Zimmer erlaubt": 0.75, "Rauchen überall erlaubt": 1.0,
}
DOW_MAP = {"Mon": 1, "Tue": 2, "Wed": 3, "Thu": 4, "Fri": 5, "Sat": 6, "Sun": 7}


def _age_bucket(col: Column) -> Column:
    return (
        F.when(col < 20, "20")
        .when(col < 30, "30")
        .when(col < 40, "40")
        .when(col < 60, "60")
        .otherwise("100")
    )


def feature_engineering(
    ads: DataFrame, grid: DataFrame | None = None, cell_geometry: str = "bowtie"
) -> DataFrame:
    two_pi = 2 * math.pi
    pub = F.col("published_on")
    ds0 = F.col("details_searched") == 0

    ads = ads.withColumn(
        "days_since_2022", F.datediff(pub, F.lit("2022-01-01").cast("date")).cast("long")
    ).withColumn("day_of_week_publication", F.date_format(pub, "EEE"))

    avail_from = F.coalesce(F.col("available_from"), pub)
    ads = ads.withColumn(
        "days_available",
        F.when(F.col("available_to").isNull(), F.lit(730)).otherwise(
            F.datediff(F.col("available_to"), avail_from)
        ).cast("long"),
    )
    d = F.col("days_available")
    ads = ads.withColumn(
        "rental_length_term",
        F.when(d <= 30, "30days")
        .when(d <= 90, "90days")
        .when(d <= 180, "180days")
        .when(d <= 270, "270days")
        .when(d < 365, "365days")
        .when(d < 540, "540days")
        .otherwise("plus540days"),
    )

    for src, dst, mapping in [
        ("furniture", "furniture_numerical", FURNITURE_MAP),
        ("kitchen", "kitchen_numerical", KITCHEN_MAP),
        ("smoking", "smoking_numerical", SMOKING_MAP),
    ]:
        v = _map_chain(F.col(src), mapping, default=0.0)
        ads = ads.withColumn(dst, F.when(ds0, F.lit(None)).otherwise(v))

    ads = ads.withColumn(
        "age_category_searched",
        F.concat(
            _age_bucket(F.col("min_age_searched")),
            F.lit("_"),
            _age_bucket(F.col("max_age_searched")),
        ),
    )

    frac = pdiv(F.col("size_sqm"), F.col("home_total_size"))
    ads = ads.withColumn("room_size_house_fraction", frac)
    ads = ads.filter(
        (F.col("room_size_house_fraction") <= 0.7)
        | F.col("room_size_house_fraction").isNull()
    )

    maxa, mina = F.col("max_age_flatmates"), F.col("min_age_flatmates")
    ads = ads.withColumn(
        "max_age_flatmates", F.when((maxa < 18) | (maxa > 80), F.lit(None)).otherwise(maxa)
    )
    ads = ads.withColumn("flat_with_kids", F.when(mina < 18, 1.0).otherwise(0.0))
    ads = ads.withColumn(
        "min_age_flatmates", F.when((mina < 18) | (mina > 80), F.lit(None)).otherwise(mina)
    )

    ads = ads.filter(
        F.col("latitude").isNotNull()
        & F.col("longitude").isNotNull()
        & (F.col("latitude") > 0)
        & (F.col("longitude") > 0)
    )

    if grid is not None:
        from .operators.spatial import grid_feature_join

        ads = grid_feature_join(ads, grid, geometry=cell_geometry)
        deg = F.col("degrees_to_centroid")
        ads = (
            ads.withColumn("sin_degrees_to_centroid", F.sin(F.lit(two_pi) * deg / 360))
            .withColumn("cos_degrees_to_centroid", F.cos(F.lit(two_pi) * deg / 360))
            .drop("degrees_to_centroid")
        )

    ads = ads.withColumn(
        "sin_published_at", F.sin(F.lit(two_pi) * F.col("published_at") / 24)
    ).withColumn("cos_published_at", F.cos(F.lit(two_pi) * F.col("published_at") / 24))
    dow = _map_chain(F.col("day_of_week_publication"), DOW_MAP)
    ads = (
        ads.withColumn("sin_day_week_int", F.sin(F.lit(two_pi) * dow / 7))
        .withColumn("cos_day_week_int", F.cos(F.lit(two_pi) * dow / 7))
    )
    return ads


# ---------------------------------------------------------------------------
# stage 6 — imputing_values (:706-783)
# ---------------------------------------------------------------------------

ZERO_IMPUTED = [
    "transfer_costs_euros",
    "extra_costs_euros",
    "mandatory_costs_euros",
    "deposit",
]
NO_ANSWER_IMPUTED = [
    "energy_certificate",
    "heating_energy_source",
    "heating",
    "parking",
    "building_type",
]


def imputing_values(ads: DataFrame) -> DataFrame:
    ds0 = F.col("details_searched") == 0
    for c in ZERO_IMPUTED:
        v = F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        ads = ads.withColumn(c, F.when(ds0, F.lit(None)).otherwise(v))

    # assume German is spoken where no languages were listed (:752-756)
    nl = F.col("number_languages")
    ads = ads.withColumn(
        "languages_deutsch",
        F.when(ds0, F.lit(None)).otherwise(
            F.when(nl.isNull(), 1.0).otherwise(F.col("languages_deutsch"))
        ),
    )
    ads = ads.withColumn(
        "number_languages", F.when(ds0, F.lit(None)).otherwise(F.coalesce(nl, F.lit(0.0)))
    )

    for c in NO_ANSWER_IMPUTED:
        v = F.coalesce(F.col(c), F.lit("no_answer"))
        ads = ads.withColumn(c, F.when(ds0, F.lit(None)).otherwise(v))
    return ads


# ---------------------------------------------------------------------------
# the composed pipeline (:785-807)
# ---------------------------------------------------------------------------


def process_ads_tables(
    ads: DataFrame, grid: DataFrame | None = None, cell_geometry: str = "bowtie"
) -> DataFrame:
    out = prepare_data(ads)
    out = filter_out_bad_entries(out, country="Germany")
    out = transform_columns_into_numerical(out)
    out = split_cat_columns(out)
    out = feature_engineering(out, grid=grid, cell_geometry=cell_geometry)
    out = imputing_values(out)
    # drop_duplicates(['id'], keep='first') — deterministic tiebreak on
    # the spatial cell index (matches the reference's sjoin row order)
    order = (
        [F.col("grid_cell_idx").asc_nulls_last()]
        if "grid_cell_idx" in out.columns
        else [F.lit(1)]
    )
    w = Window.partitionBy("id").orderBy(*order)
    out = out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop(
        "__rn"
    )
    return out.drop("grid_cell_idx") if "grid_cell_idx" in out.columns else out
