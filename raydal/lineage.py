"""Per-partition lineage manifests + checkpoint-resume.

Output layout (the resumable-output contract of the north rule; the
file-existence precedent is gdal2tiles ``--resume``,
``osgeo_utils/gdal2tiles.py:1737-1740``, hardened with fingerprints):

    out_dir/
      part-<id>.parquet          # one atomic file per partition
      _manifest/part-<id>.json   # rows, fingerprint, wall seconds

A partition is *complete* iff its manifest entry exists AND carries the
current input fingerprint; resume filters completed partitions out of the
input **before** the heavy work runs, so a restarted job only pays for
what's missing.  Writes are atomic (tmp + rename).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["completed_partitions", "checkpointed_write", "manifest_entries"]


def _manifest_dir(out_dir):
    return os.path.join(out_dir, "_manifest")


def manifest_entries(out_dir):
    md = _manifest_dir(out_dir)
    if not os.path.isdir(md):
        return {}
    out = {}
    for fn in os.listdir(md):
        if fn.startswith("part-") and fn.endswith(".json"):
            with open(os.path.join(md, fn)) as f:
                e = json.load(f)
            out[e["part"]] = e
    return out


def completed_partitions(out_dir, fingerprint):
    """Partition ids whose manifest matches the current input fingerprint."""
    return {p for p, e in manifest_entries(out_dir).items()
            if e.get("fingerprint") == fingerprint
            and os.path.exists(os.path.join(out_dir, f"part-{p}.parquet"))}


def checkpointed_write(ds, out_dir, part_col, fingerprint):
    """Write ``ds`` partitioned by ``part_col`` with resume support.

    Returns a summary DataFrame (part, rows, skipped).  Partitions already
    complete under ``fingerprint`` are filtered out before the shuffle; each
    group writes its own parquet file atomically and records a manifest
    entry.  Rerunning after a kill produces byte-identical output and
    skips finished partitions.
    """
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    done = completed_partitions(out_dir, fingerprint)

    if done:
        import ray
        done_ref = ray.put(done)

        def drop_done(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            dset = ray.get(done_ref)
            mask = pc.invert(pc.is_in(
                t[part_col], value_set=pa.array(list(dset))))
            return t.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        pid = g[part_col].iloc[0]
        # normalize (e.g. float64 from a nullable int column) so the
        # filename, the manifest entry, and completed_partitions agree
        if isinstance(pid, float) and float(pid).is_integer():
            pid = int(pid)
        elif hasattr(pid, "item"):
            pid = pid.item()
        t0 = time.monotonic()
        g = g.sort_values([c for c in g.columns]).reset_index(drop=True)
        final = os.path.join(out_dir, f"part-{pid}.parquet")
        tmp = final + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)
        entry = {"part": int(pid) if not isinstance(pid, str) else pid,
                 "rows": int(len(g)), "fingerprint": fingerprint,
                 "seconds": round(time.monotonic() - t0, 4),
                 "written_at": time.time()}
        mtmp = os.path.join(_manifest_dir(out_dir), f"part-{pid}.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(entry, f)
        os.replace(mtmp, mtmp[:-4])
        return pd.DataFrame({"part": [entry["part"]], "rows": [entry["rows"]],
                             "skipped": [False]})

    summary = ds.groupby(part_col).map_groups(
        write_group, batch_format="pandas").to_pandas()
    entries = manifest_entries(out_dir)
    skipped = pd.DataFrame({"part": sorted(done),
                            "rows": [entries[p]["rows"]
                                     for p in sorted(done)],
                            "skipped": [True] * len(done)})
    out = pd.concat([summary, skipped], ignore_index=True)
    # empty frames concat to object/float dtype — pin the flag to bool
    out["skipped"] = out["skipped"].fillna(False).astype(bool)
    return out
