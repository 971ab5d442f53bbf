#!/usr/bin/env python
"""Run bench.py's measurement for several configs in ONE TPU process.

The axon tunnel pays a 2-6 min cold start on the first jit per process;
batching configs amortizes it. Prints one JSON line per config.

Config syntax: NAME[:ai] — the ":ai" suffix measures the neural-2x
reconstruction mode (BENCH_AI=1) for that entry, e.g.

    python scripts/bench_sweep.py spheres1080_1m spheres1080_1m:ai
"""
import json
import os
import sys

CONFIGS = sys.argv[1:] or ["cube512", "spheres1080", "spheres1080_1m",
                           "ultra4k", "shadows1080"]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

for cfg in CONFIGS:
    name, _, mode = cfg.partition(":")
    os.environ["BENCH_CONFIG"] = name
    os.environ["BENCH_AI"] = "1" if mode == "ai" else "0"
    # reset kernel knobs to the env baseline so a config's policy overlay
    # (e.g. shadows1080 → zskip) can't leak into the next config
    from trident_tpu.ops import kernel_knobs

    kernel_knobs.apply(kernel_knobs.env_defaults())
    try:
        bench.main()
    except SystemExit as exc:          # check_aux overflow / bad config
        print(json.dumps({
            "metric": f"bench_error_{cfg}", "value": 0, "unit": "none",
            "vs_baseline": 0, "extra": {"error": str(exc)}}), flush=True)
    except Exception as exc:           # e.g. a missing :ai checkpoint
        # one failing config must not abort the sweep: the whole point of
        # this script is amortizing the 2-6 min per-process cold start
        print(json.dumps({
            "metric": f"bench_error_{cfg}", "value": 0, "unit": "none",
            "vs_baseline": 0,
            "extra": {"error": f"{type(exc).__name__}: {exc}"}}), flush=True)
    sys.stdout.flush()
