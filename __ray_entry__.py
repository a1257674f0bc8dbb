"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the raydal library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# The driver may import this module from any cwd; make the library
# importable here and ship it by value to Ray workers (which may not have
# the repo on their sys.path).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import raydal  # noqa: E402

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(raydal)
except Exception:  # pragma: no cover — older ray without the API
    pass


def entry() -> Any:
    """Flagship pipeline on sf0.001: image table (derived from part keys)
    → decode → warp to EPSG:3857 → tile-assign (z=10) → polygon-zone
    spatial join → per-zone aggregate.  Returns the per-zone counts."""
    from raydal.pipelines import flagship

    res = flagship("/root/testdata/sf0.001", warp_sample=60)
    return res["per_zone"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from raydal.queries import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    from raydal.queries import oracle_sqls

    return oracle_sqls()
