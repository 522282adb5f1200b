"""Synthetic car_data generator (reference op S7,
``backend/func.py:49-155``).

The reference builds rows one at a time in driver Python (capped at
10,000). This generator is column-wise and fully distributed:
``spark.range(n)`` partitions the id space across executors and every
column is a deterministic expression of the row id (seeded xxhash64 →
uniform doubles), so generating 10^11 rows for a 100 TB test is the same
code as 10^3 — no driver loop, no data transfer, reproducible.

Value ranges mirror the reference's generator: brand-consistent models,
min price in [0.8×suggested, suggested], horsepower 80-500, doors
{2,4,5}, year 2010-2025, popularity 1-1000, discount 0-20, and the two
map columns (historical_price monthly, city_license_plates per city).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BRAND_MODELS: dict[str, list[str]] = {
    "比亚迪": ["汉", "唐", "秦", "宋"],
    "吉利": ["博越", "帝豪", "星瑞"],
    "长城": ["哈弗H6", "坦克300"],
    "奇瑞": ["瑞虎8", "艾瑞泽5"],
    "特斯拉": ["Model 3", "Model Y"],
    "大众": ["朗逸", "帕萨特", "途观"],
    "丰田": ["卡罗拉", "凯美瑞", "汉兰达"],
    "本田": ["思域", "雅阁", "CR-V"],
}
CITIES = ["北京", "上海", "广州", "深圳", "杭州", "成都", "西安", "武汉"]
CAR_TYPES = ["轿车", "SUV", "MPV", "跑车", "皮卡", "新能源", "电动汽车"]


def _u(seed: int, *cols: Column) -> Column:
    """Deterministic uniform double in [0, 1) from the row id + a seed —
    xxhash64 is a JVM built-in, evaluated per-row with no Python."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)).cast("double")


def _pick(options: list[str], u: Column) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (u * len(options)).cast("int") + 1)


def generate_car_data(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic distributed car_data generator."""
    df = spark.range(n_rows).select(F.col("id"))
    rid = F.col("id")

    brands = list(BRAND_MODELS)
    brand_u = _u(seed + 1, rid)
    brand = _pick(brands, brand_u)
    # model pool depends on the brand (brand-consistent, like the reference)
    model = F.lit(None).cast("string")
    model_u = _u(seed + 2, rid)
    for b, models in BRAND_MODELS.items():
        model = F.when(brand == b, _pick(models, model_u)).otherwise(model)

    suggested = F.round(80_000 + _u(seed + 3, rid) * 420_000, 2)
    min_price = F.round(suggested * (0.8 + _u(seed + 4, rid) * 0.2), 2)
    car_type = _pick(CAR_TYPES, _u(seed + 5, rid))

    n_hist = (_u(seed + 6, rid) * 5).cast("int") + 3  # 3-7 monthly points
    hist_entries = F.transform(
        F.sequence(F.lit(1), n_hist),
        lambda i: F.struct(
            F.concat(
                F.lit("2023-"), F.lpad(i.cast("string"), 2, "0")
            ).alias("key"),
            (50_000 + (_u(seed + 7, rid, i) * 350_000).cast("int")).alias("value"),
        ),
    )
    n_cities = (_u(seed + 8, rid) * 4).cast("int") + 2  # 2-5 cities
    city_entries = F.transform(
        F.sequence(F.lit(1), n_cities),
        lambda i: F.struct(
            _pick(CITIES, _u(seed + 9, rid, i)).alias("key"),
            (1_000 + (_u(seed + 10, rid, i) * 99_000).cast("int")).alias("value"),
        ),
    )

    return df.select(
        brand.alias("car_brand"),
        _pick(CITIES, _u(seed + 11, rid)).alias("city"),
        model.alias("car_model"),
        suggested.alias("manufacturer_suggested_price"),
        (80 + (_u(seed + 12, rid) * 421).cast("int")).alias("engine_horsepower"),
        _pick(["2", "4", "5"], _u(seed + 13, rid)).cast("int").alias("num_doors"),
        min_price.alias("min_reference_price"),
        car_type.alias("car_type"),
        (2010 + (_u(seed + 14, rid) * 16).cast("int")).alias("manufacture_year"),
        F.when(car_type.isin("新能源", "电动汽车"), F.lit(0.0))
        .otherwise(F.round(30 + _u(seed + 15, rid) * 50, 2))
        .alias("fuel_capacity"),
        (1 + (_u(seed + 16, rid) * 1000).cast("int")).alias("popularity"),
        F.round(_u(seed + 17, rid) * 20, 2).alias("discount_percentage"),
        F.map_from_entries(hist_entries).alias("historical_price"),
        # duplicate city keys within one row would fail map creation —
        # dedup by key keeping the first occurrence
        F.map_from_entries(
            F.filter(
                city_entries,
                lambda e, i: ~F.array_contains(
                    F.transform(F.slice(city_entries, 1, i), lambda p: p["key"]),
                    e["key"],
                ),
            )
        ).alias("city_license_plates"),
    )
