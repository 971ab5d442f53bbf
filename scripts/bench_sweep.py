#!/usr/bin/env python
"""Run bench.py's measurement for several configs in ONE TPU process.

The axon tunnel pays a 2-6 min cold start on the first jit per process;
batching configs amortizes it. Prints one JSON line per config.
"""
import os
import sys

CONFIGS = sys.argv[1:] or ["cube512", "spheres1080", "spheres1080_1m", "ultra4k"]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

for cfg in CONFIGS:
    os.environ["BENCH_CONFIG"] = cfg
    bench.main()
    sys.stdout.flush()
