"""Round-3 batched hardware session: bench (scan+interactive) at the
flagship config, then the large-scale stage profile — one process, one
remote-helper cold start.

    PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/perf_r3.py
Env: BENCH_CONFIG (default spheres1080_1m), PROFILE=0 to skip stages.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("BENCH_CONFIG", "spheres1080_1m")
    import bench
    bench.main()
    if os.environ.get("PROFILE", "1") != "0":
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts"))
        import profile_stages
        profile_stages.profile(1920, 1080, 36, "1080p 1M tris", n=10)


if __name__ == "__main__":
    main()
