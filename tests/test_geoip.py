"""Geo/IP field types (stages/geoip.py): kernel correctness + Dataset ops."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_data_import_handler_ray.stages.geoip import (
    cidr_mask,
    geo_bounding_box,
    geo_distance,
    geo_knn,
    geohash_strings,
    geotile,
    haversine_m,
    ip_cidr_filter,
    ip_range_agg,
    ipv4_to_uint32,
)


def _pts(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(-90, 90, n),
        rng.uniform(-180, 180, n),
        np.arange(n, dtype=np.int64),
    )


def _ds(lat, lon, ids):
    return ray.data.from_arrow(
        pa.table({"doc_id": ids, "lat": lat, "lon": lon})
    ).repartition(4)


def test_haversine_known_distances():
    # Paris → London ≈ 343.5 km on the mean-radius sphere
    d = haversine_m(np.array([48.8566]), np.array([2.3522]), 51.5074, -0.1278)
    assert 341_000 < d[0] < 346_000
    # antipodal ≈ half the circumference
    d = haversine_m(np.array([0.0]), np.array([0.0]), 0.0, 180.0)
    assert d[0] == pytest.approx(np.pi * 6_371_000, rel=1e-9)
    assert haversine_m(np.array([12.3]), np.array([45.6]), 12.3, 45.6)[0] == 0.0


def test_geo_distance_filter_matches_bruteforce():
    lat, lon, ids = _pts()
    got = geo_distance(_ds(lat, lon, ids), "lat", "lon",
                       origin=(10.0, 20.0), radius_m=3_000_000).to_pandas()
    d = haversine_m(lat, lon, 10.0, 20.0)
    want = set(ids[d <= 3_000_000])
    assert set(got["doc_id"]) == want
    assert (got["distance_m"] <= 3_000_000).all()


def test_geo_bounding_box_plain_and_dateline():
    lat, lon, ids = _pts()
    ds = _ds(lat, lon, ids)
    got = geo_bounding_box(ds, "lat", "lon", top_left=(40, -10),
                           bottom_right=(20, 30)).to_pandas()
    want = (lat <= 40) & (lat >= 20) & (lon >= -10) & (lon <= 30)
    assert set(got["doc_id"]) == set(ids[want])
    # wrap: left 170 .. right -170 crosses the anti-meridian
    got = geo_bounding_box(ds, "lat", "lon", top_left=(90, 170),
                           bottom_right=(-90, -170)).to_pandas()
    want = (np.abs(lon) >= 170)
    assert set(got["doc_id"]) == set(ids[want])


def test_geo_knn_matches_bruteforce():
    lat, lon, ids = _pts()
    got = geo_knn(_ds(lat, lon, ids), "lat", "lon",
                  origin=(48.85, 2.35), k=15).to_pandas()
    d = haversine_m(lat, lon, 48.85, 2.35)
    order = np.lexsort((ids, d))[:15]
    assert list(got["doc_id"]) == list(ids[order])
    assert (np.diff(got["distance_m"]) >= 0).all()


def test_geotile_reference_points():
    # zoom 0: everything is tile (0, 0)
    x, y = geotile([51.5, -33.9], [-0.13, 151.2], 0)
    assert list(x) == [0, 0] and list(y) == [0, 0]
    # London at zoom 4 → tile (7, 5) (slippy-map reference)
    x, y = geotile([51.5074], [-0.1278], 4)
    assert (x[0], y[0]) == (7, 5)
    # pole clamp stays in range
    x, y = geotile([90.0, -90.0], [179.99, -180.0], 6)
    assert set(y) <= set(range(64)) and set(x) <= set(range(64))


def test_geohash_reference_values():
    # canonical examples from the geohash spec
    assert geohash_strings([57.64911], [10.40744], 6) == ["u4pruy"]
    assert geohash_strings([48.8566], [2.3522], 5) == ["u09tv"]
    assert geohash_strings([0.0], [0.0], 5) == ["s0000"]


def test_ipv4_parse_and_errors():
    ips = pa.array(["0.0.0.0", "255.255.255.255", "10.1.2.3", "192.168.0.1"])
    got = ipv4_to_uint32(ips)
    assert list(got) == [0, 0xFFFFFFFF, (10 << 24) | (1 << 16) | (2 << 8) | 3,
                         (192 << 24) | (168 << 16) | 1]
    with pytest.raises(ValueError, match="octets"):
        ipv4_to_uint32(pa.array(["1.2.3"]))
    with pytest.raises(ValueError, match="octet"):
        ipv4_to_uint32(pa.array(["1.2.3.999"]))
    assert len(ipv4_to_uint32(pa.array([], type=pa.string()))) == 0


def test_cidr_mask():
    assert cidr_mask("10.0.0.0/8") == (10 << 24, 0xFF000000)
    assert cidr_mask("0.0.0.0/0") == (0, 0)
    assert cidr_mask("1.2.3.4") == ((1 << 24) | (2 << 16) | (3 << 8) | 4, 0xFFFFFFFF)
    with pytest.raises(ValueError):
        cidr_mask("1.2.3.4/33")
    with pytest.raises(ValueError):
        cidr_mask("300.0.0.0/8")


def test_ip_cidr_filter_and_range_agg():
    ips = [f"10.{i % 4}.0.{i}" for i in range(100)] + [
        f"192.168.1.{i}" for i in range(50)
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(150)), "ip": ips})
    ).repartition(3)
    got = ip_cidr_filter(ds, "ip", "10.0.0.0/8").to_pandas()
    assert len(got) == 100
    got = ip_cidr_filter(ds, "ip", "10.2.0.0/16").to_pandas()
    assert len(got) == 25
    agg = ip_range_agg(
        ds, "ip", {"ten": "10.0.0.0/8", "private_c": "192.168.0.0/16",
                   "none": "8.8.8.0/24", "all": "0.0.0.0/0"}
    ).to_pandas().set_index("range")["n"]
    assert agg["ten"] == 100 and agg["private_c"] == 50
    assert agg["none"] == 0 and agg["all"] == 150


@pytest.fixture(scope="module")
def geo_index(sf_dir, tmp_path_factory):
    """documents + doc_id-derived lat/lon indexed with lat/lon doc-values."""
    import os

    import pyarrow.parquet as pq

    from elasticsearch_data_import_handler_ray.index.build import build_index
    from elasticsearch_data_import_handler_ray.index.query import QueryEngine
    from elasticsearch_data_import_handler_ray.state.manifest import IndexConfig

    root = tmp_path_factory.mktemp("geoidx")
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    docs = docs.append_column(
        "lat", pa.array(((ids * 7919) % 18000) / 100.0 - 90.0)
    ).append_column("lon", pa.array(((ids * 104729) % 36000) / 100.0 - 180.0))
    src = str(root / "docs.parquet")
    pq.write_table(docs, src)
    idx = str(root / "idx")
    build_index(
        src, idx, mode="full",
        config=IndexConfig(analyzer="whitespace", num_segments=4,
                           doc_id_col="doc_id", content_col="text",
                           store_cols=("lat", "lon")),
    )
    eng = QueryEngine(idx)
    yield eng, docs.to_pandas()
    eng.close()


def test_geo_distance_filter_context(geo_index):
    """ES bool.filter.geo_distance: BM25 top-k restricted to docs within the
    radius, scores UNCHANGED (filter context) — vs brute-force recompute."""
    eng, docs = geo_index
    origin, radius = (10.0, 20.0), 4_000_000.0
    d = haversine_m(docs["lat"].to_numpy(), docs["lon"].to_numpy(),
                    origin[0], origin[1])
    inside = set(docs["doc_id"][d <= radius].astype(np.uint64))
    full = eng.search("hash join", k=10**6)
    want = [(doc, s) for doc, s in full if doc in inside][:10]
    got = eng.search_filtered(
        "hash join",
        {"field": "lat", "geo_distance": {"lon_field": "lon",
                                          "origin": origin,
                                          "radius_m": radius}},
        k=10,
    )
    assert got == want
    # composes with plain doc-value clauses
    got2 = eng.search_filtered(
        "hash join",
        [{"field": "lat", "geo_distance": {"lon_field": "lon",
                                           "origin": origin,
                                           "radius_m": radius}},
         {"field": "lat", "gte": 0.0}],
        k=10,
    )
    inside2 = {d_ for d_ in inside} & set(
        docs["doc_id"][docs["lat"] >= 0.0].astype(np.uint64)
    )
    want2 = [(doc, s) for doc, s in full if doc in inside2][:10]
    assert got2 == want2
