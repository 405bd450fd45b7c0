"""Geo-point and IP field types (ES geo_distance / geo_bounding_box /
geotile_grid / geohash_grid queries+aggs, ip CIDR term/range aggs).

ES models these as typed fields with specialized queries; here they are
vectorized Dataset transforms (numpy / pyarrow.compute kernels inside
map_batches, plain Ray tasks — no state, nothing driver-side except the
k-sized / bucket-sized results).

Scale shape: every operator is a single streamed pass; the only exchanges
are bucket-count groupbys (|tiles| or |ranges| rows after per-batch partial
counting) and the k-row sort cut in geo_knn.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = [
    "haversine_m",
    "geo_distance",
    "geo_bounding_box",
    "geo_knn",
    "geotile",
    "geotile_grid",
    "geohash_strings",
    "geohash_grid",
    "ipv4_to_uint32",
    "cidr_mask",
    "ip_cidr_filter",
    "ip_range_agg",
]

_EARTH_R_M = 6_371_000.0  # ES's GeoUtils.EARTH_MEAN_RADIUS


# --------------------------------------------------------------------------
# geo kernels
# --------------------------------------------------------------------------


def haversine_m(lat1, lon1, lat2: float, lon2: float) -> np.ndarray:
    """Great-circle distance in meters (haversine, mean-radius sphere —
    the same model ES's geo_distance uses). Vectorized over point arrays."""
    rlat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    rlon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    rlat2, rlon2 = math.radians(lat2), math.radians(lon2)
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * math.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * _EARTH_R_M * np.arcsin(np.sqrt(a))


def geo_distance(
    ds: ray.data.Dataset,
    lat_col: str,
    lon_col: str,
    *,
    origin: tuple[float, float],
    radius_m: float,
    distance_col: str = "distance_m",
) -> ray.data.Dataset:
    """ES geo_distance query: rows within ``radius_m`` of ``origin``
    (lat, lon), with the computed distance appended. One streamed pass."""
    olat, olon = float(origin[0]), float(origin[1])

    def f(t: pa.Table) -> pa.Table:
        d = haversine_m(
            t[lat_col].to_numpy(zero_copy_only=False),
            t[lon_col].to_numpy(zero_copy_only=False),
            olat, olon,
        )
        keep = d <= radius_m
        return t.filter(pa.array(keep)).append_column(
            distance_col, pa.array(d[keep], type=pa.float64())
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def geo_bounding_box(
    ds: ray.data.Dataset,
    lat_col: str,
    lon_col: str,
    *,
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
) -> ray.data.Dataset:
    """ES geo_bounding_box query. Handles the date-line crossing case the
    way ES does (left > right ⇒ the box wraps)."""
    top, left = float(top_left[0]), float(top_left[1])
    bottom, right = float(bottom_right[0]), float(bottom_right[1])

    def f(t: pa.Table) -> pa.Table:
        lat = t[lat_col]
        lon = t[lon_col]
        ok_lat = pc.and_(pc.less_equal(lat, top), pc.greater_equal(lat, bottom))
        if left <= right:
            ok_lon = pc.and_(pc.greater_equal(lon, left), pc.less_equal(lon, right))
        else:  # wraps the anti-meridian
            ok_lon = pc.or_(pc.greater_equal(lon, left), pc.less_equal(lon, right))
        return t.filter(pc.and_(ok_lat, ok_lon))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def geo_knn(
    ds: ray.data.Dataset,
    lat_col: str,
    lon_col: str,
    *,
    origin: tuple[float, float],
    k: int,
    id_col: str = "doc_id",
    distance_col: str = "distance_m",
) -> ray.data.Dataset:
    """ES sort-by-_geo_distance top-k: nearest ``k`` rows to ``origin``.

    Per-batch partial top-k (argpartition) cuts each batch to ≤k rows
    BEFORE the sort exchange, so the wide step moves k·batches rows, not
    the corpus. Ties break on ``id_col`` for determinism."""
    olat, olon = float(origin[0]), float(origin[1])

    def partial(t: pa.Table) -> pa.Table:
        d = haversine_m(
            t[lat_col].to_numpy(zero_copy_only=False),
            t[lon_col].to_numpy(zero_copy_only=False),
            olat, olon,
        )
        t = t.append_column(distance_col, pa.array(d, type=pa.float64()))
        if len(t) > k:
            idx = np.argpartition(d, k)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort([distance_col, id_col])
        .limit(k)
    )


def geotile(lat, lon, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """ES geotile_grid cell = slippy-map tile (x, y) at ``zoom``."""
    n = float(1 << zoom)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    x = np.floor((lon + 180.0) / 360.0 * n)
    rlat = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(rlat) + 1.0 / np.cos(rlat)) / math.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def geotile_grid(
    ds: ray.data.Dataset, lat_col: str, lon_col: str, *, zoom: int = 6
) -> ray.data.Dataset:
    """ES geotile_grid aggregation: doc counts per z/x/y tile. Per-batch
    partial counts (one row per tile per batch) ride the groupby, not docs."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x, y = geotile(
            t[lat_col].to_numpy(zero_copy_only=False),
            t[lon_col].to_numpy(zero_copy_only=False),
            zoom,
        )
        key = x * (1 << zoom) + y
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tile_x": pa.array(uniq // (1 << zoom), type=pa.int64()),
                "tile_y": pa.array(uniq % (1 << zoom), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["tile_x", "tile_y"])
        .aggregate(Sum("n", alias_name="n"))
    )


_GEOHASH_B32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def _geohash_packed(lat, lon, precision: int = 5) -> tuple[bytes, int]:
    """Standard geohash (the ES geohash_grid cell id), vectorized: interleave
    lon/lat bits to 5·precision, then base32. Returns the concatenated
    fixed-width char bytes (decode via geohash_strings)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    # quantize each axis to its bit budget (binary subdivision == scaling)
    lon_q = np.minimum(
        ((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.uint64),
        (1 << lon_bits) - 1,
    )
    lat_q = np.minimum(
        ((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.uint64),
        (1 << lat_bits) - 1,
    )
    # interleave: even bit positions (from MSB) are lon, odd are lat
    code = np.zeros(len(lon), dtype=np.uint64)
    for i in range(nbits):
        if i % 2 == 0:  # lon bit
            bit = (lon_q >> np.uint64(lon_bits - 1 - i // 2)) & np.uint64(1)
        else:  # lat bit
            bit = (lat_q >> np.uint64(lat_bits - 1 - i // 2)) & np.uint64(1)
        code = (code << np.uint64(1)) | bit
    # base32: peel precision 5-bit groups, MSB first
    chars = np.empty((precision, len(lon)), dtype=np.uint8)
    for j in range(precision):
        shift = np.uint64(5 * (precision - 1 - j))
        chars[j] = _GEOHASH_B32[((code >> shift) & np.uint64(31)).astype(np.int64)]
    return chars.T.tobytes(), precision  # packed; decode below


def geohash_strings(lat, lon, precision: int = 5) -> list[str]:
    packed, p = _geohash_packed(lat, lon, precision)
    return [packed[i : i + p].decode() for i in range(0, len(packed), p)]


def geohash_grid(
    ds: ray.data.Dataset, lat_col: str, lon_col: str, *, precision: int = 5
) -> ray.data.Dataset:
    """ES geohash_grid aggregation: doc counts per geohash cell (same
    partial-count shape as geotile_grid)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        hs = geohash_strings(
            t[lat_col].to_numpy(zero_copy_only=False),
            t[lon_col].to_numpy(zero_copy_only=False),
            precision,
        )
        arr = pa.array(hs, type=pa.string())
        counts = pa.table({"geohash": arr}).group_by("geohash").aggregate(
            [("geohash", "count")]
        )
        return pa.table(
            {
                "geohash": counts["geohash"],
                "n": pc.cast(counts["geohash_count"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("geohash")
        .aggregate(Sum("n", alias_name="n"))
    )


# --------------------------------------------------------------------------
# ip kernels
# --------------------------------------------------------------------------


def ipv4_to_uint32(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Parse an IPv4 string column to uint32, fully vectorized (split +
    flatten + cast — no Python per row). Raises on malformed addresses."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.uint32)
    parts = pc.split_pattern(col, ".")
    lens = pc.list_value_length(parts)
    if not pc.all(pc.equal(lens, 4)).as_py():
        raise ValueError("malformed IPv4 (expected 4 octets)")
    flat = pc.cast(pc.list_flatten(parts), pa.uint32()).to_numpy(zero_copy_only=False)
    if flat.max(initial=0) > 255:
        raise ValueError("malformed IPv4 (octet > 255)")
    return (
        (flat[0::4] << np.uint32(24))
        | (flat[1::4] << np.uint32(16))
        | (flat[2::4] << np.uint32(8))
        | flat[3::4]
    )


def cidr_mask(cidr: str) -> tuple[int, int]:
    """'10.1.0.0/16' → (network_uint32, mask_uint32)."""
    base, _, bits = cidr.partition("/")
    nbits = int(bits) if bits else 32
    if not (0 <= nbits <= 32):
        raise ValueError(f"bad CIDR prefix length in {cidr!r}")
    octets = [int(o) for o in base.split(".")]
    if len(octets) != 4 or any(not (0 <= o <= 255) for o in octets):
        raise ValueError(f"bad CIDR base in {cidr!r}")
    ip = (octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3]
    mask = (0xFFFFFFFF << (32 - nbits)) & 0xFFFFFFFF if nbits else 0
    return ip & mask, mask


def ip_cidr_filter(ds: ray.data.Dataset, ip_col: str, cidr: str) -> ray.data.Dataset:
    """ES ip term/CIDR query: rows whose IPv4 ``ip_col`` falls in ``cidr``."""
    net, mask = cidr_mask(cidr)

    def f(t: pa.Table) -> pa.Table:
        ips = ipv4_to_uint32(t[ip_col])
        return t.filter(pa.array((ips & np.uint32(mask)) == np.uint32(net)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ip_range_agg(
    ds: ray.data.Dataset, ip_col: str, ranges: dict[str, str]
) -> ray.data.Dataset:
    """ES ip_range aggregation: doc counts per named CIDR bucket (a doc can
    fall in several buckets, like ES). Per-batch partial counts; the groupby
    moves |ranges|·batches rows."""
    from ray.data.aggregate import Sum

    masks = {name: cidr_mask(c) for name, c in ranges.items()}

    def partial(t: pa.Table) -> pa.Table:
        ips = ipv4_to_uint32(t[ip_col])
        names, counts = [], []
        for name, (net, mask) in masks.items():
            names.append(name)
            counts.append(int(((ips & np.uint32(mask)) == np.uint32(net)).sum()))
        return pa.table(
            {
                "range": pa.array(names, type=pa.string()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("range")
        .aggregate(Sum("n", alias_name="n"))
    )
