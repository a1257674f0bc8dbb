"""Multidimensional arrays (GDAL multidim / MDArray semantics).

Reference surface: ``gcore/gdalmultidim.cpp`` (GDALMDArray::GetView —
Python-slice view strings incl. ``...``, negative steps and
integer-index dimension drops; Transpose; Read) and
``apps/gdalmdimtranslate_lib.cpp`` (view/transpose/subset/scaleaxes
specs; sliced dimensions are renamed
``subset_<dim>_<start>_<step>_<count>`` and an integer-indexed
dropped dimension leaves ``DIM_<name>_INDEX`` / ``DIM_<name>_VALUE``
attributes — see autotest/utilities/test_gdalmdimtranslate_lib.py
goldens, which these semantics are tested against).

The in-memory graph is tiny metadata; bulk pixel movement happens in
:func:`mdarray_to_dataset`, which fans one Ray task out per outer
slice so each worker decodes only its own hyperslab.
"""

from __future__ import annotations

import os as _os

import numpy as np

from ..io.hdf5 import HDF5File
from ..io.netcdf import _NC_DTYPE, parse_netcdf
from ..io.zarr import open_zarr, open_zarr_array

__all__ = ["Dimension", "MDArray", "parse_view", "open_mdarray",
           "mdarray_to_dataset"]


class Dimension:
    def __init__(self, name, size, dim_type="", direction="",
                 values=None):
        self.name = name
        self.size = int(size)
        self.type = dim_type
        self.direction = direction
        self.values = values          # optional indexing-variable values

    def __repr__(self):
        return f"Dimension({self.name!r}, {self.size})"


def parse_view(spec, ndim):
    """``"[::-1,1,...]"`` → tuple of slices/ints, GDALMDArray::GetView
    grammar (Python slicing with ``...`` expansion)."""
    s = spec.strip()
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    parts = [p.strip() for p in s.split(",")] if s else []
    out = []
    ell_at = None
    for p in parts:
        if p == "...":
            if ell_at is not None:
                raise ValueError("only one '...' allowed")
            ell_at = len(out)
            out.append(Ellipsis)
        elif ":" in p:
            bits = p.split(":")
            if len(bits) > 3:
                raise ValueError(f"bad slice {p!r}")
            vals = [int(b) if b else None for b in bits]
            while len(vals) < 3:
                vals.append(None)
            out.append(slice(*vals))
        else:
            out.append(int(p))
    n_real = sum(1 for o in out if o is not Ellipsis)
    if ell_at is not None:
        out[ell_at:ell_at + 1] = [slice(None)] * (ndim - n_real)
    elif n_real < ndim:
        out.extend([slice(None)] * (ndim - n_real))
    if len(out) > ndim:
        raise ValueError(f"view has {len(out)} terms for {ndim} dims")
    return tuple(out)


class MDArray:
    """A lazily-evaluated multidimensional array view.

    ``source`` is a zero-arg callable returning the FULL backing numpy
    array; views/transposes compose as metadata and apply on read.
    """

    def __init__(self, name, dims, source, dtype,
                 ops=None, attributes=None):
        self.name = name
        self.dims = list(dims)
        self._source = source
        self.dtype = np.dtype(dtype)
        self._ops = list(ops or [])
        self.attributes = dict(attributes or {})

    # -- construction ---------------------------------------------------

    @classmethod
    def from_numpy(cls, name, arr, dim_names=None):
        arr = np.asarray(arr)
        names = dim_names or [f"dim{i}" for i in range(arr.ndim)]
        dims = [Dimension(n, s) for n, s in zip(names, arr.shape)]
        return cls(name, dims, lambda a=arr: a, arr.dtype)

    @property
    def shape(self):
        return tuple(d.size for d in self.dims)

    @property
    def ndim(self):
        return len(self.dims)

    # -- views (gdalmultidim.cpp GetView) --------------------------------

    def get_view(self, spec):
        """Slice view; string spec or tuple of slices/ints.  Integer
        terms DROP the dimension and record DIM_<name>_INDEX/_VALUE
        attributes; sliced dims are renamed
        ``subset_<name>_<start>_<step>_<count>``."""
        view = parse_view(spec, self.ndim) if isinstance(spec, str) \
            else tuple(spec)
        if len(view) > self.ndim:
            raise ValueError(f"view has {len(view)} terms for "
                             f"{self.ndim} dims")
        # pad short tuple specs like the string grammar does
        view = view + (slice(None),) * (self.ndim - len(view))
        new_dims = []
        attrs = dict(self.attributes)
        for d, term in zip(self.dims, view):
            if isinstance(term, int):
                idx = term if term >= 0 else d.size + term
                attrs[f"DIM_{d.name}_INDEX"] = idx
                if d.values is not None:
                    attrs[f"DIM_{d.name}_VALUE"] = d.values[idx]
                continue
            start, stop, step = term.indices(d.size)
            count = max(0, (stop - start + (step - (1 if step > 0
                                                    else -1)))
                        // step)
            if (start, step, count) == (0, 1, d.size):
                new_dims.append(d)
            else:
                vals = None
                if d.values is not None:
                    vals = d.values[term]
                new_dims.append(Dimension(
                    f"subset_{d.name}_{start}_{step}_{count}", count,
                    d.type, d.direction if step > 0 else "", vals))
        return MDArray(self.name, new_dims, self._source, self.dtype,
                       self._ops + [("view", view)], attrs)

    def transpose(self, order):
        """GDALMDArray::Transpose — ``order`` is the new-axis → old-axis
        map (e.g. [1,2,0])."""
        if sorted(order) != list(range(self.ndim)):
            raise ValueError(f"bad transpose order {order}")
        new_dims = [self.dims[i] for i in order]
        return MDArray(self.name, new_dims, self._source, self.dtype,
                       self._ops + [("transpose", tuple(order))],
                       self.attributes)

    def scaleaxes(self, factors):
        """mdimtranslate scaleaxes: subsample dim ``name`` by integer
        factor via a step view (apps/gdalmdimtranslate_lib.cpp)."""
        view = []
        for d in self.dims:
            f = factors.get(d.name, 1)
            view.append(slice(None, None, f) if f != 1
                        else slice(None))
        return self.get_view(tuple(view))

    # -- evaluation -------------------------------------------------------

    def read(self):
        arr = np.asarray(self._source())
        for op, arg in self._ops:
            if op == "view":
                arr = arr[arg]
            else:
                arr = np.transpose(arr, arg)
        if arr.dtype != self.dtype:
            arr = arr.astype(self.dtype)
        return arr


def open_mdarray(path, array, dim_names=None):
    """Open an MDArray over an HDF5 dataset or a netCDF variable (the
    engine's from-scratch readers).  netCDF supplies real dimension
    names; HDF5 uses dim0..n unless overridden."""
    p = str(path)
    if p.rstrip("/").endswith((".zarr", ".zr3")) or \
            _os.path.exists(_os.path.join(p, "zarr.json")) or \
            _os.path.exists(_os.path.join(p, ".zgroup")) or \
            _os.path.exists(_os.path.join(p, ".zarray")):
        ar = open_zarr_array(p, array)
        names = dim_names or ar.dimension_names or \
            [f"dim{i}" for i in range(ar.ndim)]
        root = open_zarr(p)
        values = {}
        if hasattr(root, "open_array"):
            for n in names:
                cv = root.open_array(n)
                if cv is not None and cv.ndim == 1:
                    values[n] = np.asarray(cv.read())
        dims = []
        for n, s in zip(names, ar.shape):
            low = n.lower()
            dtyp, direc = "", ""
            if low in ("lat", "latitude", "y"):
                dtyp, direc = "HORIZONTAL_Y", "NORTH"
            elif low in ("lon", "longitude", "x"):
                dtyp, direc = "HORIZONTAL_X", "EAST"
            dims.append(Dimension(n, s, dim_type=dtyp,
                                  direction=direc,
                                  values=values.get(n)))
        aname = array or ar.name

        def zsrc():
            return np.asarray(open_zarr_array(p, aname).read())

        return MDArray(ar.name, dims, zsrc, ar.dtype)
    if p.endswith((".nc", ".nc4", ".cdf")):
        nc = parse_netcdf(p)
        v = nc.vars[array]
        names = nc.var_dim_names(v)
        values = {}
        for n in names:
            cv = nc.vars.get(n)
            if cv is not None and len(cv.shape) == 1:
                values[n] = np.asarray(cv.data())
        dims = [Dimension(n, s, values=values.get(n))
                for n, s in zip(names, v.shape)]

        def src():
            return np.asarray(parse_netcdf(p).vars[array].data())

        try:
            dt = np.dtype(_NC_DTYPE[v.nc_type][0])
        except Exception:
            dt = np.asarray(v.data()).dtype
        return MDArray(array, dims, src, dt)
    f = HDF5File(p)
    cat = f.datasets()
    key = array if array in cat else "/" + array
    shape, dt = cat[key]
    names = dim_names or [f"dim{i}" for i in range(len(shape))]
    dims = [Dimension(n, s) for n, s in zip(names, shape)]

    def src():
        return HDF5File(p).read(key)

    return MDArray(array, dims, src, dt)


def mdarray_to_dataset(md, path=None, array=None):
    """MDArray → Ray Dataset of raster rows: the trailing two dims are
    (y, x); one row per combination of the leading dims, decoded
    INSIDE the task so only each worker's slab leaves it.

    For file-backed arrays pass ``path``/``array`` so each task
    re-opens the source independently instead of shipping the driver's
    closure.
    """
    import pyarrow as pa
    import ray.data

    if md.ndim < 2:
        raise ValueError("need >= 2 dims for raster rows")
    outer_shape = md.shape[:-2]
    n_outer = int(np.prod(outer_shape)) if outer_shape else 1
    ops = md._ops
    dtype = md.dtype
    dim_names = [d.name for d in md.dims]
    name = md.name
    src = None if path is not None else md._source

    def build(batch: pa.Table) -> pa.Table:
        if path is not None:
            base = open_mdarray(path, array)
            full = base.read()
        else:
            full = np.asarray(src())
        for op, arg in ops:
            full = full[arg] if op == "view" \
                else np.transpose(full, arg)
        full = full.astype(dtype, copy=False)
        rows = {"image_id": [], "band": [], "data": [], "w": [],
                "h": [], "dtype": [], "geotransform": [], "nodata": []}
        for flat in batch["outer"].to_pylist():
            idx = np.unravel_index(flat, outer_shape) if outer_shape \
                else ()
            a = np.ascontiguousarray(full[idx])
            label = ",".join(f"{n}={i}" for n, i in
                             zip(dim_names, idx)) or "full"
            rows["image_id"].append(f"{name}[{label}]")
            rows["band"].append(1)
            rows["data"].append(a.tobytes())
            rows["w"].append(a.shape[1])
            rows["h"].append(a.shape[0])
            rows["dtype"].append(str(a.dtype))
            rows["geotransform"].append(None)
            rows["nodata"].append(None)
        return pa.Table.from_pydict(rows)

    return ray.data.range(n_outer).map_batches(
        lambda t: pa.Table.from_pydict(
            {"outer": pa.array(np.asarray(t["id"]), pa.int64())}),
        batch_format="pyarrow").map_batches(
        build, batch_format="pyarrow")
