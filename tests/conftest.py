"""Shared pytest fixtures: one SparkSession per test session, the
reference's golden 4-row mock (values from the reference test suite
``backend/test_app.py:24-104``), and testdata paths."""

from __future__ import annotations

import os

import pytest

from automotive_big_data_analysis_spark import get_spark
from automotive_big_data_analysis_spark.catalog import car_data_from_rows

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_SMALL = "/root/testdata/sf0.01"

# Golden 4-row mock — reference backend/test_app.py:24-81.
MOCK_CAR_DATA = [
    dict(
        car_brand="Brand1",
        car_model="Model1",
        manufacturer_suggested_price=85000.00,
        engine_horsepower=150,
        num_doors=4,
        min_reference_price=80000.00,
        car_type="Sedan",
        manufacture_year=2020,
        popularity=75,
        discount_percentage=5.0,
        historical_price={"2023-01": 90000, "2023-02": 88000},
        city_license_plates={"CityA": 50, "CityB": 25},
    ),
    dict(
        car_brand="Brand1",
        car_model="Model2",
        manufacturer_suggested_price=250000.00,
        engine_horsepower=250,
        num_doors=5,
        min_reference_price=220000.00,
        car_type="SUV",
        manufacture_year=2021,
        popularity=90,
        discount_percentage=3.5,
        historical_price={"2023-01": 240000, "2023-02": 235000},
        city_license_plates={"CityA": 30, "CityC": 40},
    ),
    dict(
        car_brand="Brand2",
        car_model="Model1",
        manufacturer_suggested_price=380000.00,
        engine_horsepower=300,
        num_doors=2,
        min_reference_price=350000.00,
        car_type="Sports",
        manufacture_year=2022,
        popularity=85,
        discount_percentage=2.0,
        historical_price={"2023-01": 370000, "2023-02": 365000},
        city_license_plates={"CityB": 60, "CityC": 20},
    ),
    dict(
        car_brand="Brand3",
        car_model="Model1",
        manufacturer_suggested_price=600000.00,
        engine_horsepower=400,
        num_doors=2,
        min_reference_price=550000.00,
        car_type="Luxury",
        manufacture_year=2023,
        popularity=95,
        discount_percentage=1.5,
        historical_price={"2023-01": 590000, "2023-02": 585000},
        city_license_plates={"CityA": 10, "CityD": 30},
    ),
]

# City-projection mock — reference backend/test_app.py:83-88.
MOCK_CITY_DATA = [
    dict(city="CityA", city_license_plates={"CityA": 90}),
    dict(city="CityB", city_license_plates={"CityB": 85}),
    dict(city="CityC", city_license_plates={"CityC": 60}),
    dict(city="CityD", city_license_plates={"CityD": 30}),
]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def car_data(spark):
    return car_data_from_rows(spark, MOCK_CAR_DATA).cache()


@pytest.fixture(scope="session")
def city_data(spark):
    return car_data_from_rows(spark, MOCK_CITY_DATA).cache()
