"""KML superoverlay writer (Google-Earth tile pyramid).

Reference semantics: ``frmts/kmlsuperoverlay/kmlsuperoverlaydataset.cpp``
— CreateCopy (:600+): maxzoom/tile-size from the longer side halved
until <= 400 px, tiles laid out ``{z}/{ix}/{iy}.{ext}`` with iy counted
from the SOUTH edge, pixels decimated per-row at the zoom's sampling
rate (GenerateTiles :38), per-tile KML (GenerateChildKml :237 —
Region/LatLonAltBox from south + zoomypixel*iy*dysize, minLodPixels
128 (1 at z0), maxLodPixels 2048 only when a child has its own KML,
GroundOverlay drawOrder=zoom, NetworkLinks to the 4 children with
``../../z/x/y.kml`` hrefs), and a root document with one NetworkLink
to ``0/0/0.kml`` (GenerateRootKml :158, minLodPixels = tilesize/2).

Projected sources pass ``to_lonlat`` (vectorized (x, y) → (lon, lat));
WGS84-UTM codes route through :mod:`raydal.geo.crs`'s Krüger series.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

import numpy as np

from .codecs import decode, encode
from ..geo.crs import utm_to_lonlat

__all__ = ["write_superoverlay", "write_superoverlay_kmz",
           "read_superoverlay", "superoverlay_plan"]


def superoverlay_plan(xsize, ysize):
    """(maxzoom, tilexsize, tileysize) — the reference's halve-until-
    <=400 rule on the longer side."""
    maxzoom = 0
    if xsize >= ysize:
        d = float(xsize)
        while d > 400:
            d /= 2
            maxzoom += 1
        tx = int(d)
        ty = int(d * ysize / xsize)
    else:
        d = float(ysize)
        while d > 400:
            d /= 2
            maxzoom += 1
        ty = int(d)
        tx = int(d * xsize / ysize)
    return maxzoom, tx, ty


def _root_kml(path, name, description, north, south, east, west,
              tilesize):
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<kml xmlns="http://www.opengis.net/kml/2.2">',
        "\t<Document>",
        f"\t\t<name>{escape(name)}</name>",
        f"\t\t<description>{escape(description or '')}</description>",
        "\t\t<styleUrl>#hideChildrenStyle</styleUrl>",
        '\t\t<Style id="hideChildrenStyle">',
        '\t\t\t<ListStyle id="hideChildren">',
        "\t\t\t\t<listItemType>checkHideChildren</listItemType>",
        "\t\t\t</ListStyle>",
        "\t\t</Style>",
        "\t\t<NetworkLink>",
        "\t\t\t<open>1</open>",
        "\t\t\t<Region>",
        "\t\t\t\t<LatLonAltBox>",
        f"\t\t\t\t\t<north>{north:f}</north>",
        f"\t\t\t\t\t<south>{south:f}</south>",
        f"\t\t\t\t\t<east>{east:f}</east>",
        f"\t\t\t\t\t<west>{west:f}</west>",
        "\t\t\t\t</LatLonAltBox>",
        "\t\t\t\t<Lod>",
        f"\t\t\t\t\t<minLodPixels>{tilesize // 2}</minLodPixels>",
        "\t\t\t\t\t<maxLodPixels>-1</maxLodPixels>",
        "\t\t\t\t</Lod>",
        "\t\t\t</Region>",
        "\t\t\t<Link>",
        "\t\t\t\t<href>0/0/0.kml</href>",
        "\t\t\t\t<viewRefreshMode>onRegion</viewRefreshMode>",
        "\t\t\t</Link>",
        "\t\t</NetworkLink>",
        "\t</Document>",
        "</kml>",
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def _child_kml(path, zoom, ix, iy, zoomxpix, zoomypix, dxsize, dysize,
               south, west, maxzoom, ext, child_tiles, to_lonlat):
    tnorth = south + zoomypix * ((iy + 1) * dysize)
    tsouth = south + zoomypix * (iy * dysize)
    teast = west + zoomxpix * ((ix + 1) * dxsize)
    twest = west + zoomxpix * (ix * dxsize)
    if to_lonlat is not None:
        twest, tsouth = to_lonlat(twest, tsouth)
        teast, tnorth = to_lonlat(teast, tnorth)
    min_lod = 1 if zoom == 0 else 128
    max_lod = -1
    if zoom < maxzoom and any(has_kml for _xy, has_kml in child_tiles):
        max_lod = 2048
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<kml xmlns="http://www.opengis.net/kml/2.2" '
        'xmlns:gx="http://www.google.com/kml/ext/2.2">',
        "\t<Document>",
        f"\t\t<name>{zoom}/{ix}/{iy}.kml</name>",
        "\t\t<styleUrl>#hideChildrenStyle</styleUrl>",
        '\t\t<Style id="hideChildrenStyle">',
        '\t\t\t<ListStyle id="hideChildren">',
        "\t\t\t\t<listItemType>checkHideChildren</listItemType>",
        "\t\t\t</ListStyle>",
        "\t\t</Style>",
        "\t\t<Region>",
        "\t\t\t<LatLonAltBox>",
        f"\t\t\t\t<north>{tnorth:f}</north>",
        f"\t\t\t\t<south>{tsouth:f}</south>",
        f"\t\t\t\t<east>{teast:f}</east>",
        f"\t\t\t\t<west>{twest:f}</west>",
        "\t\t\t</LatLonAltBox>",
        "\t\t\t<Lod>",
        f"\t\t\t\t<minLodPixels>{min_lod}</minLodPixels>",
        f"\t\t\t\t<maxLodPixels>{max_lod}</maxLodPixels>",
        "\t\t\t</Lod>",
        "\t\t</Region>",
        "\t\t<GroundOverlay>",
        f"\t\t\t<drawOrder>{zoom}</drawOrder>",
        "\t\t\t<Icon>",
        f"\t\t\t\t<href>{iy}{ext}</href>",
        "\t\t\t</Icon>",
        "\t\t\t<LatLonBox>",
        f"\t\t\t\t<north>{tnorth:f}</north>",
        f"\t\t\t\t<south>{tsouth:f}</south>",
        f"\t\t\t\t<east>{teast:f}</east>",
        f"\t\t\t\t<west>{twest:f}</west>",
        "\t\t\t</LatLonBox>",
        "\t\t</GroundOverlay>",
    ]
    for (cx, cy), _has in child_tiles:
        cnorth = south + zoomypix / 2 * ((cy + 1) * dysize)
        csouth = south + zoomypix / 2 * (cy * dysize)
        ceast = west + zoomxpix / 2 * ((cx + 1) * dxsize)
        cwest = west + zoomxpix / 2 * (cx * dxsize)
        if to_lonlat is not None:
            cwest, csouth = to_lonlat(cwest, csouth)
            ceast, cnorth = to_lonlat(ceast, cnorth)
        out += [
            "\t\t<NetworkLink>",
            f"\t\t\t<name>{zoom + 1}/{cx}/{cy}{ext}</name>",
            "\t\t\t<Region>",
            "\t\t\t\t<Lod>",
            "\t\t\t\t\t<minLodPixels>128</minLodPixels>",
            "\t\t\t\t\t<maxLodPixels>-1</maxLodPixels>",
            "\t\t\t\t</Lod>",
            "\t\t\t\t<LatLonAltBox>",
            f"\t\t\t\t\t<north>{cnorth:f}</north>",
            f"\t\t\t\t\t<south>{csouth:f}</south>",
            f"\t\t\t\t\t<east>{ceast:f}</east>",
            f"\t\t\t\t\t<west>{cwest:f}</west>",
            "\t\t\t\t</LatLonAltBox>",
            "\t\t\t</Region>",
            "\t\t\t<Link>",
            f"\t\t\t\t<href>../../{zoom + 1}/{cx}/{cy}.kml</href>",
            "\t\t\t\t<viewRefreshMode>onRegion</viewRefreshMode>",
            "\t\t\t\t<viewFormat/>",
            "\t\t\t</Link>",
            "\t\t</NetworkLink>",
        ]
    out += ["\t</Document>", "</kml>"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


def _decimate(band, rx, ry, rxsize, rysize, dxsize, dysize):
    """RasterIO-style nearest decimation of the (rx, ry, rxsize,
    rysize) window to dxsize x dysize (center sampling)."""
    ys = ry + np.minimum(
        ((np.arange(dysize) + 0.5) * (rysize / dysize)).astype(int),
        rysize - 1)
    xs = rx + np.minimum(
        ((np.arange(dxsize) + 0.5) * (rxsize / dxsize)).astype(int),
        rxsize - 1)
    return band[np.ix_(ys, xs)]


def write_superoverlay(bands, geotransform, out_dir, fmt="png",
                       name=None, description=None, to_lonlat=None,
                       nodata=None, root_name="doc.kml"):
    """Write a KML superoverlay directory tree.

    ``bands``: 2-D uint8 array or list of same-shape 2-D arrays (1 =
    gray, 3 = RGB).  ``to_lonlat``: optional (x, y) → (lon, lat) for
    projected sources.  Returns the list of files written (relative).
    """
    if isinstance(bands, np.ndarray) and bands.ndim == 2:
        bands = [bands]
    bands = [np.asarray(b) for b in bands]
    h, w = bands[0].shape
    gt = list(geotransform)
    north = gt[3]
    south = gt[3] + gt[5] * h
    east = gt[0] + gt[1] * w
    west = gt[0]
    if to_lonlat is not None:
        west, south = to_lonlat(west, south)
        east, north = to_lonlat(east, north)
    maxzoom, tilex, tiley = superoverlay_plan(w, h)
    ext = ".jpg" if fmt == "jpeg" else ".png"

    os.makedirs(out_dir, exist_ok=True)
    files = []
    _root_kml(os.path.join(out_dir, root_name),
              name or os.path.basename(out_dir), description,
              north, south, east, west, tilex)
    files.append(root_name)

    tmp_south = gt[3] + gt[5] * h
    child_tiles = {}          # (ix, iy) at zoom+1 grouped by parent
    for zoom in range(maxzoom, -1, -1):
        zoomxpix = gt[1] * (2 ** (maxzoom - zoom))
        zoomypix = abs(gt[5]) * (2 ** (maxzoom - zoom))
        rmaxx = tilex * (1 << (maxzoom - zoom))
        rmaxy = tiley * (1 << (maxzoom - zoom))
        xloop = max(1, w // rmaxx)
        yloop = max(1, h // rmaxy)
        current = {}
        for ix in range(xloop):
            rx = ix * rmaxx
            for iy in range(yloop):
                ry = h - iy * rmaxy - rmaxy
                tdir = os.path.join(out_dir, str(zoom), str(ix))
                os.makedirs(tdir, exist_ok=True)
                tile_bands = [_decimate(b, rx, ry, rmaxx, rmaxy,
                                        tilex, tiley) for b in bands]
                px = tile_bands[0] if len(tile_bands) == 1 \
                    else np.stack(tile_bands, axis=2)
                if fmt != "jpeg" and (px.ndim == 2
                                      or px.shape[2] < 4):
                    # PNG tiles carry an alpha band (opaque, 0 at
                    # nodata) like the reference
                    alpha = np.full((tiley, tilex), 255, np.uint8)
                    if nodata is not None:
                        alpha[tile_bands[0] == nodata] = 0
                    if px.ndim == 2:
                        px = np.stack([px, px, px, alpha], axis=2)
                    else:
                        px = np.concatenate(
                            [px, alpha[:, :, None]], axis=2)
                img_rel = f"{zoom}/{ix}/{iy}{ext}"
                with open(os.path.join(out_dir, img_rel), "wb") as f:
                    f.write(encode(px.astype(np.uint8),
                                   "jpeg" if fmt == "jpeg" else "png"))
                files.append(img_rel)
                kids = child_tiles.get((ix, iy), [])
                kml_rel = f"{zoom}/{ix}/{iy}.kml"
                _child_kml(os.path.join(out_dir, kml_rel), zoom, ix,
                           iy, zoomxpix, zoomypix, tilex, tiley,
                           tmp_south, gt[0], maxzoom, ext, kids,
                           to_lonlat)
                files.append(kml_rel)
                current.setdefault((ix // 2, iy // 2), []).append(
                    ((ix, iy), bool(kids)))
        child_tiles = current
    return files


def write_superoverlay_kmz(bands, geotransform, kmz_path, **kwargs):
    """Superoverlay packed into a .kmz (zip) — the reference's
    ``/vsizip/`` path when the target filename ends in .kmz; the root
    document is stored as ``doc.kml`` inside the archive."""
    import shutil
    import tempfile
    import zipfile

    tmp = tempfile.mkdtemp(prefix="raydal_kmz_")
    try:
        files = write_superoverlay(bands, geotransform, tmp,
                                   root_name="doc.kml", **kwargs)
        with zipfile.ZipFile(kmz_path, "w",
                             zipfile.ZIP_DEFLATED) as z:
            for rel in files:
                z.write(os.path.join(tmp, rel), rel)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return kmz_path


def read_superoverlay(root):
    """Read a superoverlay directory (or .kmz) back as a full-
    resolution mosaic (the KmlSuperOverlayReadDataset analogue:
    deepest zoom level reassembled, geotransform from the root
    document's LatLonAltBox).

    Returns (bands, geotransform): ``bands`` a list of 2-D uint8
    arrays (alpha dropped).
    """
    import glob
    import re
    import zipfile

    ziph = None
    if str(root).endswith((".kmz", ".zip")):
        ziph = zipfile.ZipFile(root)
        names = ziph.namelist()
        doc = ziph.read("doc.kml").decode()

        def listing(pat):
            rx = re.compile(pat)
            return [n for n in names if rx.fullmatch(n)]

        def blob(rel):
            return ziph.read(rel)
    else:
        with open(os.path.join(root, "doc.kml")) as f:
            doc = f.read()

        def listing(pat):
            rx = re.compile(pat)
            out = []
            for p in glob.glob(os.path.join(root, "*", "*", "*")):
                rel = os.path.relpath(p, root).replace(os.sep, "/")
                if rx.fullmatch(rel):
                    out.append(rel)
            return out

        def blob(rel):
            with open(os.path.join(root, rel), "rb") as f:
                return f.read()

    def field(tag):
        import re as _re
        m = _re.search(f"<{tag}>([-0-9.]+)</{tag}>", doc)
        if not m:
            raise ValueError(f"doc.kml missing <{tag}>")
        return float(m.group(1))

    north, south = field("north"), field("south")
    east, west = field("east"), field("west")

    tiles = listing(r"(\d+)/(\d+)/(\d+)\.(png|jpg)")
    if not tiles:
        raise ValueError("no tiles found")
    import re as _re
    parsed = [tuple(map(int, _re.match(
        r"(\d+)/(\d+)/(\d+)", t).groups())) + (t,) for t in tiles]
    maxzoom = max(z for z, _x, _y, _t in parsed)
    deepest = [(x, y, t) for z, x, y, t in parsed if z == maxzoom]
    nx = max(x for x, _y, _t in deepest) + 1
    ny = max(y for _x, y, _t in deepest) + 1

    sample = decode(blob(deepest[0][2]))
    th, tw = sample.shape[:2]
    nchan = 1 if sample.ndim == 2 else min(sample.shape[2], 3)
    H, W = th * ny, tw * nx
    bands = [np.zeros((H, W), np.uint8) for _ in range(nchan)]
    for x, y, rel in deepest:
        px = decode(blob(rel))
        if px.ndim == 2:
            px = px[:, :, None]
        # iy counts from the SOUTH edge
        r0 = H - (y + 1) * th
        for b in range(nchan):
            bands[b][r0:r0 + th, x * tw:x * tw + tw] = \
                px[:, :, min(b, px.shape[2] - 1)]
    if ziph is not None:
        ziph.close()
    gt = [west, (east - west) / W, 0.0, north, 0.0,
          (south - north) / H]
    return bands, gt


def epsg_to_lonlat(epsg):
    """(x, y) → (lon, lat) hook for :func:`write_superoverlay` from a
    WGS84-UTM EPSG code (326xx/327xx) via the engine's Krüger series;
    EPSG 4326 returns None (already geographic)."""
    if epsg in (4326, None):
        return None

    def fn(x, y, _epsg=int(epsg)):
        lon, lat = utm_to_lonlat(x, y, _epsg)
        return float(lon), float(lat)

    return fn
