"""Job entry point — the `ray job submit` target for cluster runs.

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/run_job.py flagship --sf-dir <data> --z 10

In this sandbox (local mode) it runs the same code under
``ray.init(address="local")``.  Owns its Ray session (guarded init +
shutdown); the library itself never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("job", choices=["flagship", "pyramid", "queries"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--z", type=int, default=10)
    ap.add_argument("--z-min", type=int, default=6)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--query", action="append", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.monotonic()
    if args.job == "flagship":
        from raydal.pipelines import flagship

        res = flagship(args.sf_dir, z=args.z)
        out = {
            "job": "flagship",
            "n_zone_pairs": int(res["per_zone"]["n_images"]
                                .combine_chunks().to_pandas().sum()),
            "tile_summary": {
                k: res["tile_summary"][k][0].as_py()
                for k in ("n_cells", "n_assignments")},
        }
    elif args.job == "pyramid":
        from raydal.pipelines import tile_pyramid

        res = tile_pyramid(args.sf_dir, z_max=args.z, z_min=args.z_min,
                           out_dir=args.out_dir)
        out = {"job": "pyramid",
               "tiles_per_level": {z: ds.count()
                                   for z, ds in res["levels"].items()}}
        if res["write_summary"] is not None:
            out["partitions_written"] = int(
                (~res["write_summary"]["skipped"]).sum())
            out["partitions_skipped"] = int(
                res["write_summary"]["skipped"].sum())
    else:
        from raydal.queries import query_fns

        fns = query_fns()
        names = args.query or list(fns)
        out = {"job": "queries", "results": {}}
        for name in names:
            qt = time.monotonic()
            res = fns[name](args.sf_dir)
            n = len(res.to_pandas()) if hasattr(res, "to_pandas") else len(res)
            out["results"][name] = {"rows": n,
                                    "sec": round(time.monotonic() - qt, 2)}
    out["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
