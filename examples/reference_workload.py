#!/usr/bin/env python
"""The reference's complete published workload, end to end, on this engine.

Reproduces what /root/reference/darima.py:492-493 runs (its README's only
usage): all ten GEFCom-style zones, the full 2,879-step hourly horizon,
AR truncation tol=2000, mean combine — i.e. the exact config shape of
darima_config.json + auto_arima.R.

Measured on local[32] against the reference's own CSVs: ~13 s wall for
scan → split → 40 window fits → combine → 10 × 2,879-step forecasts with
80/95% intervals → MASE/sMAPE/MSIS evaluation (the resulting mean scores
are pinned to a golden band in tests/test_reference_accuracy.py). The reference runs this
workload on a 4-node Dataproc cluster with rpy2-embedded R fits and a
driver-side pandas forecast/eval stage; it published no timings
(BASELINE.md), so the engine's own number is the recorded bar.

Run: python examples/reference_workload.py [data_dir]
"""

from __future__ import annotations

import os
import sys
import time

# runnable as `python examples/reference_workload.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_darima_spark import get_spark
from python_darima_spark.darima.pipeline import DarimaConfig, darima
from python_darima_spark.sources import read_reference_series_csv


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data"
    spark = get_spark(app_name="reference-workload")

    t0 = time.perf_counter()
    train = read_reference_series_csv(spark, f"{data}/*_train.csv")
    test = read_reference_series_csv(spark, f"{data}/*_test.csv")

    cfg = DarimaConfig(num_windows=4, period=24, method="mean", tol=2000)
    res = darima(train, cfg, test_df=test, h=2879)

    scores = res.scores.collect()[0].asDict()
    wall = time.perf_counter() - t0

    print(f"zones: {train.select('series_id').distinct().count()}")
    print(f"forecast rows: {res.forecasts.count()}")
    print("mean scores:", {k: round(v, 4) for k, v in scores.items()})
    print(f"wall: {wall:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
