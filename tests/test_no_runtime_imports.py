"""Regression guard: no runtime (indented) relative imports in
worker-executed modules.

The driver may initialize Ray from a cwd where ``raydal`` is not on
``sys.path``; ``__ray_entry__`` ships the package to workers by-value via
cloudpickle, which covers module-global references but NOT literal
``import`` statements executed inside actor ``__init__``/``__call__`` or
batch functions.  Any indented ``from .``/``from raydal`` in the modules
below would crash worker actors in that configuration (this bit twice
during round 1 — FlagshipActor and GridInterpolate).
"""

import os
import re

import raydal

WORKER_DIRS = ("geo", "kernels", "io", "ops")
_PATTERN = re.compile(r"^\s+(from \.|from raydal|import raydal)")


def test_no_indented_relative_imports():
    root = os.path.dirname(raydal.__file__)
    offenders = []
    for d in WORKER_DIRS:
        for fn in os.listdir(os.path.join(root, d)):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, d, fn)
            with open(path) as f:
                for ln, line in enumerate(f, 1):
                    if _PATTERN.match(line):
                        offenders.append(f"{d}/{fn}:{ln}: {line.strip()}")
    assert not offenders, (
        "runtime relative imports in worker-executed modules (hoist to "
        "module top level):\n" + "\n".join(offenders))


# In driver-level modules, imports at function depth (indent 4) run on
# the DRIVER and are fine; imports inside NESTED defs (indent >= 8) are
# worker-shipped closures and must be hoisted to the enclosing function.
_DEEP_PATTERN = re.compile(r"^\s{8,}(from \.|from raydal|import raydal)")
DRIVER_MODULES = ("queries.py", "pipelines.py", "pipeline.py",
                  "lineage.py")


def test_no_deep_relative_imports_in_driver_modules():
    root = os.path.dirname(raydal.__file__)
    offenders = []
    for fn in DRIVER_MODULES:
        with open(os.path.join(root, fn)) as f:
            for ln, line in enumerate(f, 1):
                if _DEEP_PATTERN.match(line):
                    offenders.append(f"{fn}:{ln}: {line.strip()}")
    assert not offenders, (
        "relative imports inside worker-shipped closures (hoist to the "
        "enclosing driver function):\n" + "\n".join(offenders))
