"""Deterministic scenario datasets mirroring the reference's two
bundled example CSVs (make_example_data.py:116-166). The reference
ships fixed CSV files; re-distributing them is neither possible nor
desirable here, so these generators reproduce the datasets' documented
STRUCTURE from their public descriptions, giving the example notebooks
(PCA-CD / kdq on circle, STEPD / LFR on rainfall) equivalent fixtures:

- Circle (Minku 2010, "dataCircleGSev3Sp3Train.csv"): 2000 rows,
  features (var1, var2) in [0,1]^2, binary y = inside a circle;
  gradual concept + feature drift over indices 1000-1250 affecting
  ~66% of points (the circle moves and the affected points cluster
  around the new center).
- Rainfall (Souza 2020 NOAA, "rainfall_data.csv"): 18159 rows of 8
  weather features + binary rain label; concept AND data drift start
  at index 12000 and persist to the end.

Both are seeded numpy -> spark.createDataFrame (tiny fixtures); the
explicit ``idx`` column is the stream order key, as everywhere else in
this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CIRCLE_DRIFT_START = 1000
CIRCLE_DRIFT_END = 1250
RAINFALL_DRIFT_START = 12_000
RAINFALL_N = 18_159


def fetch_circle_data(spark: SparkSession, n: int = 2000, seed: int = 7) -> DataFrame:
    """(idx, var1, var2, y) — concept A: circle center (0.4, 0.5),
    radius 0.2; inside drift window, 66% of points switch to concept B
    (center (0.6, 0.5), radius 0.25) with features drawn around the
    new center, changing both P(X) and P(y|X)."""
    rng = np.random.default_rng(seed)
    var1 = rng.uniform(0, 1, n)
    var2 = rng.uniform(0, 1, n)
    in_window = (np.arange(n) >= CIRCLE_DRIFT_START) & (np.arange(n) < CIRCLE_DRIFT_END)
    drifted = in_window & (rng.uniform(0, 1, n) < 0.66)
    var1[drifted] = np.clip(rng.normal(0.7, 0.1, drifted.sum()), 0, 1)
    var2[drifted] = np.clip(rng.normal(0.5, 0.1, drifted.sum()), 0, 1)
    d_a = (var1 - 0.4) ** 2 + (var2 - 0.5) ** 2
    d_b = (var1 - 0.6) ** 2 + (var2 - 0.5) ** 2
    y = np.where(drifted, (d_b <= 0.25**2), (d_a <= 0.2**2)).astype(float)
    pdf = pd.DataFrame(
        {"idx": np.arange(n), "var1": var1, "var2": var2, "y": y}
    )
    return spark.createDataFrame(pdf)


RAINFALL_FEATURES = [
    "temperature",
    "dew_point",
    "sea_level_pressure",
    "visibility",
    "average_wind_speed",
    "max_sustained_wind_speed",
    "minimum_temperature",
    "maximum_temperature",
]


def fetch_rainfall_data(
    spark: SparkSession, n: int = RAINFALL_N, seed: int = 11
) -> DataFrame:
    """(idx, 8 weather features, rain) — seasonal weather series; rain
    follows a dew-point/pressure rule. From index 12000 on, feature
    levels shift (data drift) and the rain rule changes sign on the
    pressure term (concept drift), persisting to the end."""
    rng = np.random.default_rng(seed)
    idx = np.arange(n)
    season = np.sin(2 * np.pi * idx / 365.0)
    drift = idx >= RAINFALL_DRIFT_START

    temperature = 15 + 10 * season + rng.normal(0, 3, n) + np.where(drift, 4.0, 0.0)
    dew_point = temperature - np.abs(rng.normal(5, 2, n)) - np.where(drift, 3.0, 0.0)
    sea_level_pressure = 1013 + rng.normal(0, 5, n) - np.where(drift, 6.0, 0.0)
    visibility = np.clip(10 - 0.3 * (temperature - dew_point) + rng.normal(0, 1, n), 0, 10)
    average_wind_speed = np.abs(rng.normal(8, 3, n)) + np.where(drift, 2.0, 0.0)
    max_sustained_wind_speed = average_wind_speed + np.abs(rng.normal(5, 2, n))
    minimum_temperature = temperature - np.abs(rng.normal(4, 1.5, n))
    maximum_temperature = temperature + np.abs(rng.normal(4, 1.5, n))

    spread = temperature - dew_point
    press_anom = sea_level_pressure - 1013
    score = -0.5 * spread - np.where(drift, -1.0, 1.0) * 0.3 * press_anom + rng.normal(0, 1.0, n)
    rain = (score > -2.0).astype(float)

    pdf = pd.DataFrame(
        {
            "idx": idx,
            "temperature": temperature,
            "dew_point": dew_point,
            "sea_level_pressure": sea_level_pressure,
            "visibility": visibility,
            "average_wind_speed": average_wind_speed,
            "max_sustained_wind_speed": max_sustained_wind_speed,
            "minimum_temperature": minimum_temperature,
            "maximum_temperature": maximum_temperature,
            "rain": rain,
        }
    )
    return spark.createDataFrame(pdf)
