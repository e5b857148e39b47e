"""Diagnose in-suite streaming-wall inflation (round-9 VERDICT item #6).

Runs q_stream_tumble N times in ONE session, printing each wall; with
--unload, unloads all loaded state-store providers between reps
(StateStore.stop() — a cache, not state: durable state lives in each
query's checkpoint) and drops the previous rep's memory-sink table.
Compares inflation with and without the hygiene.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    unload = "--unload" in sys.argv
    reps = int(next((a for a in sys.argv[1:] if a.isdigit()), "6"))
    from python_darima_spark import get_spark
    from python_darima_spark.queries import registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="pds-stream-inflation",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    reg = registry()
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    prev_sink = None
    for name in ("q_stream_tumble", "q_stream_anomaly", "q_stream_tumble",
                 "q_stream_anomaly") * (reps // 2):
        t0 = time.perf_counter()
        df = reg[name].fn(spark, "/root/testdata/sf0.1")
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"  {name}: {wall:.2f}s (unload={unload})", flush=True)
        if unload:
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
            if prev_sink is not None:
                spark.catalog.dropTempView(prev_sink)
            # remember this rep's sink to drop next time (df reads it now)
            prev_sink = None
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
