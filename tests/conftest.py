import os
import shutil

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def spark():
    from osc_geo_h3grid_srv_spark.engine import make_spark
    s = make_spark(cores=4, shuffle_partitions=8,
                   extra_conf={"spark.ui.enabled": "false",
                               "spark.driver.memory": "4g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def warehouse(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warehouse"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def engine(spark, warehouse):
    from osc_geo_h3grid_srv_spark.engine import GeoMeshEngine
    eng = GeoMeshEngine(spark, warehouse)
    # register the two golden flood datasets (reference example data)
    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    for sfx, name in [("0010y", "flood_0010y"), ("1000y", "flood_1000y")]:
        pdf = pd.read_parquet(os.path.join(fix, f"flood_{sfx}.parquet"))
        df = spark.createDataFrame(pdf)
        eng.load_dataset_from_df(
            name, df, dataset_type="h3_index",
            key_columns={"h3_cell": "VARCHAR"},
            value_columns={
                "flood_risk_min": "REAL", "flood_risk_max": "REAL",
                "flood_risk_median": "REAL", "flood_risk_mean": "REAL",
                "latitude": "REAL", "longitude": "REAL",
                "scenario": "VARCHAR", "risk_window": "VARCHAR",
                "date_range": "VARCHAR"},
            description=f"tu_delft flood {sfx} (golden fixture)")
    return eng


# the reference's 5-asset correlator fixture (test_correlator.py:78-107,
# germany_5_assets.parquet)
ASSETS = [
    ("Berlin", 52.52, 13.400),
    ("Frankfurt", 50.11, 8.680),
    ("Brunsbuettel", 53.89, 9.130),
    ("Bremen", 53.08, 8.803),
    ("Cologne", 50.95, 6.950),
]


@pytest.fixture(scope="session")
def assets_df(spark):
    return spark.createDataFrame(ASSETS, "id string, lat double, long double")
