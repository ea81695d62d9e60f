"""Stage decomposition helper for round-15 measurements.

Times a list of (label, dataframe-builder) stages with the noop sink
(guide §1.4), min over N passes, labeled jobs (§1.5). Import from an
ad-hoc driver script; not part of the engine.
"""

from __future__ import annotations

import time


def run_stages(spark, stages, passes: int = 3) -> dict[str, float]:
    best: dict[str, float] = {}
    for p in range(passes):
        for label, build in stages:
            spark.sparkContext.setJobDescription(f"r15:{label}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if dt < best.get(label, float("inf")):
                best[label] = dt
            print(f"pass{p} {label}: {dt:.3f}s", flush=True)
    print({k: round(v, 3) for k, v in best.items()})
    return best
