"""Same-minute paired recheck of the six queries whose driver-bench
times drifted >1.5x between BENCH_r02 and BENCH_r03 (round-3 verdict
item 7) — none of whose code changed in round 3.

Methodology (the scaling_paired.py lesson): sequential benches let
each query inherit whichever minute of shared-host noise it lands in,
so round-over-round per-query comparisons confound code and minutes.
Here the six queries run INTERLEAVED round-robin — q1..q6, q1..q6, ...
— so every round samples the same minutes for all six.  If the
within-process spread (max/min across rounds) is comparable to the
r2→r3 drift ratios, the drift is the box, not a plan change.

Usage: DRIFT_SET=r3|r4 python scripts/bench_drift_recheck.py [sf_dir] [rounds]
Prints one JSON line: per-query round times, min/median/max, spread,
and the r2→r3 drift ratio it is being compared against.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import noop  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402

# BENCH_r02 vs BENCH_r03 driver-recorded seconds (shared 22-query set)
DRIFTED_R3 = {
    "depr_schedule": (2.1, 4.2),
    "lineitem_agg": (0.6, 1.3),
    "nation_revenue_topk": (0.5, 1.1),
    "language_id": (0.7, 1.3),
    "events_hour_window": (0.6, 1.1),
    "depr_legacy_v1": (1.6, 2.6),
}

# BENCH_r03 vs BENCH_r04: the two queries past the documented 5.35x
# noise bound with unchanged code (round-4 verdict item 4)
DRIFTED_R4 = {
    "remaining_basis_life": (0.83, 5.81),
    "resume_anti_join": (0.40, 2.95),
}

DRIFTED = DRIFTED_R4 if os.environ.get("DRIFT_SET", "r4") == "r4" else DRIFTED_R3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark("drift-recheck")
    times: dict[str, list[float]] = {q: [] for q in DRIFTED}
    for q in DRIFTED:  # warm-up: plan construction + JIT out of band
        noop(qs[q](spark, sf_dir))
    for _ in range(rounds):
        for q in DRIFTED:
            t0 = time.time()
            noop(qs[q](spark, sf_dir))
            times[q].append(round(time.time() - t0, 3))
    out = {}
    for q, ts in times.items():
        r2, r3 = DRIFTED[q]
        out[q] = {
            "rounds": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "max": max(ts),
            "spread": round(max(ts) / min(ts), 2),
            "r2_to_r3_drift": round(r3 / r2, 2),
        }
    verdict = (
        "noise"
        if all(v["spread"] >= v["r2_to_r3_drift"] * 0.7 or v["median"] <= DRIFTED[q][1]
               for q, v in out.items())
        else "investigate"
    )
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds,
                      "queries": out, "verdict": verdict}))
    spark.stop()


if __name__ == "__main__":
    main()
