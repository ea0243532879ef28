"""Fixture determinism + the html→text byte-identity invariant."""

from __future__ import annotations

import numpy as np

from rios_spark import datagen


def test_pages_deterministic():
    a = datagen.gen_pages(300)
    b = datagen.gen_pages(300)
    assert a.equals(b)
    assert list(a.columns) == ["page_id", "url", "warc_ts", "html", "text", "lang", "lat", "lon"]
    assert a["url"].is_unique


def test_extract_text_byte_identical():
    pages = datagen.gen_pages(500)
    for html, text in zip(pages["html"], pages["text"]):
        assert datagen.extract_text(html) == text
        assert datagen.extract_text(html).encode("utf-8") == text.encode("utf-8")


def test_host_skew_is_zipf():
    pages = datagen.gen_pages(5000)
    hosts = pages["url"].str.extract(r"https://(host\d+)\.example")[0]
    counts = hosts.value_counts()
    # top host should dominate: >5x the median host count (hot tiles exist)
    assert counts.iloc[0] > 5 * counts.median()


def test_polygons_shape():
    polys = datagen.gen_polygons()
    assert (polys["kind"] == "disjoint").sum() == 1
    # disjoint polygon strictly above the page latitude band
    dis = polys[polys["kind"] == "disjoint"].iloc[0]
    assert min(dis["ys"]) > datagen.PAGE_LAT_MAX


def test_ramp_matches_rios_formula():
    df = datagen.gen_ramp(100, 100, tile=25, res=10)
    rows = df["row"].to_numpy()
    cols = df["col"].to_numpy()
    want = ((rows + cols) * 100.0 / 198.0).astype(np.uint8).astype(np.int32)
    assert (df["value"].to_numpy() == want).all()
    assert df["cell"].nunique() == 16  # 4x4 tiles of 25px
