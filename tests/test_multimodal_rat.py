"""Multimodal plumbing, RAT operators, approx stats, coordinate columns."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rios_spark import multimodal, rat, stats
from rios_spark.grid import cell_coord_cols, cell_col, np_cell, np_cell_center


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.gen_media(spark, 60).cache()


def test_media_schema_and_roundtrip(spark, media):
    assert media.count() == 60
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio"}
    # fake codec roundtrip is exact
    row = media.filter(F.col("kind") == "image").first()
    img = multimodal._decode_image(bytes(row["payload"]), row["fmt"])
    assert img.shape == (row["height"], row["width"], row["n_channels"])
    assert multimodal._decode_image(multimodal._encode_fake(img), "fake").tolist() == img.tolist()


def test_image_features_exact(spark, media):
    feats = multimodal.image_features(media).toPandas().set_index("media_id")
    rows = media.filter(F.col("kind") == "image").collect()
    assert len(feats) == len(rows)
    for r in rows[:10]:
        img = multimodal._decode_image(bytes(r["payload"]), r["fmt"]).astype(np.float64)
        got = feats.loc[r["media_id"]]
        assert got["mean_r"] == pytest.approx(img[:, :, 0].mean())
        assert got["std_gray"] == pytest.approx(img.mean(axis=2).std())
        assert got["width"] == r["width"] and got["height"] == r["height"]


def test_image_resize_shape_and_determinism(spark, media):
    out = multimodal.image_resize(media, 8, 8).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    for p in out["payload"].head(5):
        img = multimodal._decode_image(bytes(p), "fake")
        assert img.shape == (8, 8, 3)
    out2 = multimodal.image_resize(media, 8, 8).toPandas()
    assert list(out["payload"]) == list(out2["payload"])  # deterministic bytes


def test_real_codec_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="image codec"):
        multimodal._decode_image(b"\xff\xd8\xff\xe0 jpegish", "jpeg")


def test_audio_frames(spark, media):
    frames = multimodal.audio_frame_sample(media, frame_ms=25).toPandas()
    rows = {r["media_id"]: r for r in media.filter(F.col("kind") == "audio").collect()}
    assert set(frames["media_id"]) == set(rows)
    for mid, grp in frames.groupby("media_id"):
        r = rows[mid]
        spf = r["sample_rate"] * 25 // 1000
        n_samples = r["sample_rate"] * r["duration_ms"] // 1000
        assert len(grp) == n_samples // spf
        assert (grp["rms"] > 0).all()


def test_media_dedup_keys(spark, media):
    dup = media.limit(6).withColumn("media_id", F.col("media_id") + 1000)
    keys = multimodal.media_dedup_keys(media.unionByName(dup)).toPandas()
    counts = keys.groupby("payload_sha256").size()
    assert (counts == 2).sum() == 6  # planted byte-exact dups found
    # images have a phash; audio rows have null phash
    img_ids = {r["media_id"] for r in media.filter(F.col("kind") == "image").collect()}
    assert keys[keys["media_id"].isin(img_ids)]["phash"].notna().all()


def test_rat_apply_chunkwise(spark):
    """testratapplier parity: sqrd = col1**2 computed chunk-wise
    (rios/riostests/testratapplier.py:112-119)."""
    pdf = pd.DataFrame({"value": np.arange(1000), "col1": np.arange(1000) * 3.0})
    df = spark.createDataFrame(pdf).repartition(7)

    out = rat.rat_apply(
        df, lambda c: c.assign(sqrd=c["col1"] ** 2)[["value", "sqrd"]],
        "value long, sqrd double",
    ).toPandas().sort_values("value")
    assert (out["sqrd"].to_numpy() == (np.arange(1000) * 3.0) ** 2).all()


def test_color_table(spark):
    df = spark.createDataFrame(pd.DataFrame({"value": np.arange(256)}))
    colored = rat.add_color_table(df, "value", "rainbow").toPandas()
    for c in ("red", "green", "blue", "alpha"):
        assert colored[c].between(0, 255).all()
    # deterministic: run twice
    colored2 = rat.add_color_table(df, "value", "rainbow").toPandas()
    assert colored.equals(colored2)
    norm = rat.normalize_colors_01(rat.add_color_table(df, "value", "gray")).toPandas()
    assert norm["red"].between(0, 1).all()


def test_approx_stats(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = stats.approx_stats(li, "l_quantity", fraction=0.2).collect()[0]
    exact = li.agg(F.avg("l_quantity"), F.countDistinct("l_quantity")).collect()[0]
    assert got["mean"] == pytest.approx(exact[0], rel=0.05)
    assert got["approx_distinct"] == pytest.approx(exact[1], rel=0.15)
    assert 1 <= got["approx_median"] <= 50


def test_cell_coord_cols(spark):
    """testcoords parity: coordinate columns match np_cell_center."""
    pdf = pd.DataFrame({"lat": np.linspace(-80, 80, 50), "lon": np.linspace(-170, 170, 50)})
    df = spark.createDataFrame(pdf).withColumn("cell", cell_col("lat", "lon", 7))
    coords = cell_coord_cols("cell", 7)
    out = df.select("cell", *[v.alias(k) for k, v in coords.items()]).toPandas()
    clat, clon = np_cell_center(out["cell"].to_numpy())
    assert np.allclose(out["cell_lat"], clat)
    assert np.allclose(out["cell_lon"], clon)
    assert (out["cell_lat_min"] < out["cell_lat"]).all()
    assert (out["cell_lon_max"] > out["cell_lon"]).all()
    # the centre re-encodes to the same cell (round-trip contract)
    back = np_cell(out["cell_lat"].to_numpy(), out["cell_lon"].to_numpy(), 7)
    assert (back == out["cell"].to_numpy()).all()


def test_brewer_table_matches_reference_interp():
    """genTable parity (rios/colortable.py:320-392): control points
    spread over [0, n], numpy.interp, uint8 conversion; ignore_val row
    transparent."""
    from rios_spark.rat import BREWER_RAMPS, brewer_table

    n = 50
    t = brewer_table("Blues", n, ignore_val=0)
    assert list(t.columns) == ["entry", "red", "green", "blue", "alpha"]
    assert len(t) == n
    yobs = np.array([float(v) for v in BREWER_RAMPS["Blues"]["red"].split()])
    want = np.interp(
        np.linspace(0, n, n), np.linspace(0, n, len(yobs)), yobs
    ).astype(np.uint8)
    assert (t["red"].to_numpy() == want).all()
    assert t["alpha"].iloc[0] == 0 and (t["alpha"].iloc[1:] == 255).all()
    # endpoints hit the first/last control points
    assert t["red"].iloc[0] == 247


def test_add_brewer_colors_joins_by_category(spark):
    from rios_spark.rat import add_brewer_colors, brewer_table

    pdf = pd.DataFrame({"cat": np.arange(20, dtype=np.int64), "n": np.arange(20) * 3})
    out = (
        add_brewer_colors(spark.createDataFrame(pdf), "cat", "Spectral")
        .toPandas()
        .sort_values("cat")
        .reset_index(drop=True)
    )
    want = brewer_table("Spectral", 20)
    assert (out["red"].to_numpy() == want["red"].to_numpy()).all()
    assert (out["blue"].to_numpy() == want["blue"].to_numpy()).all()


def test_rat_apply_rcm_modes(spark):
    from rios_spark.rat import (
        RCM_EQUALS_INPUT,
        RCM_FIXED,
        RCM_INCREMENT,
        rat_apply_rcm,
    )

    pdf = pd.DataFrame({"cat": np.arange(30, dtype=np.int64)})
    df = spark.createDataFrame(pdf)
    fn = lambda c: pd.DataFrame({"cat": c["cat"], "double": c["cat"] * 2})  # noqa: E731
    schema = "cat long, double long"
    eq = rat_apply_rcm(df, fn, schema, RCM_EQUALS_INPUT).toPandas()
    assert len(eq) == 30 and (eq.sort_values("cat")["double"].to_numpy() == np.arange(30) * 2).all()
    fx = rat_apply_rcm(df, fn, schema, RCM_FIXED, fixed_rows=10).toPandas()
    assert len(fx) == 10 and set(fx["cat"]) == set(range(10))
    inc = spark.createDataFrame(pd.DataFrame({"cat": [100, 101], "double": [200, 202]}))
    gr = rat_apply_rcm(df, fn, schema, RCM_INCREMENT, increment=inc).toPandas()
    assert len(gr) == 32 and 101 in set(gr["cat"])


def test_external_rat_roundtrip_s15(spark, tmp_path):
    """S15: a RAT persisted as its OWN table (the RatZarrHandle
    analogue, rios/ratapplier.py:283-311) round-trips byte-exact, and
    the read-back table drives a rat_apply + broadcast join onto cell
    data exactly like an in-image RAT."""
    path = str(tmp_path / "rat_store")
    cats = pd.DataFrame(
        {
            "cat": np.arange(40, dtype=np.int64),
            "label": [f"class_{i}" for i in range(40)],
            "weight": np.linspace(0.5, 2.0, 40),
        }
    )
    rat.write_rat(spark.createDataFrame(cats), path)
    back = rat.read_rat(spark, path)
    got = back.toPandas().sort_values("cat").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, cats)

    # the external RAT behaves like any RAT: chunked user fn + join
    doubled = rat.rat_apply(
        back, lambda c: pd.DataFrame({"cat": c["cat"], "w2": c["weight"] * 2}),
        "cat long, w2 double",
    )
    pixels = spark.createDataFrame(
        pd.DataFrame({"pix": np.arange(200), "cat": np.arange(200) % 40})
    )
    joined = pixels.join(F.broadcast(doubled), "cat").toPandas()
    assert len(joined) == 200
    assert np.allclose(
        joined.sort_values("pix")["w2"].to_numpy(),
        (cats["weight"].to_numpy() * 2)[np.arange(200) % 40],
    )

    # update-in-place: write mode mirrors setCreationOptions hygiene
    rat.write_rat(spark.createDataFrame(cats.assign(weight=1.0)), path)
    assert rat.read_rat(spark, path).toPandas()["weight"].eq(1.0).all()


def test_cmdline_calcstats_printstats(spark, tmp_path, capsys):
    """Console entry points (reference: rioscalcstats/riosprintstats,
    rios/cmdline/rioscalcstats.py:31-60): calcstats persists to the
    store, printstats reads it back without rescanning the data;
    --ignore excludes the nodata value like the reference flag."""
    from rios_spark import cmdline

    tbl = str(tmp_path / "tbl")
    store = str(tmp_path / "store")
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, -999.0, 4.0], "k": [1, 2, 3, 4, 5]})
    spark.createDataFrame(pdf).write.parquet(tbl)

    rc = cmdline.calcstats_main(
        [tbl, "--store", store, "--columns", "v", "--ignore", "-999",
         "--snapshot", "s1", "--master", "local[4]"]
    )
    assert rc == 0
    got = stats.read_stats(spark, store, table=tbl, column="v").collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["count"] == 4 and r["minval"] == 1.0 and r["maxval"] == 4.0

    # second snapshot; --latest keeps only s2
    cmdline.calcstats_main(
        [tbl, "--store", store, "--columns", "v", "--snapshot", "s2",
         "--master", "local[4]"]
    )
    latest = stats.read_stats(spark, store, table=tbl, column="v", latest=True).collect()
    assert len(latest) == 1 and latest[0]["snapshot"] == "s2"
    assert latest[0]["count"] == 5  # no --ignore on the second run

    capsys.readouterr()
    rc = cmdline.printstats_main([store, "--table", tbl, "--latest", "--master", "local[4]"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "@s2" in out and "count=5" in out


def test_video_frame_sample(spark):
    """Video modality plumbing: deterministic clips decode through the
    stub codec; every_n frame sampling emits exactly the expected frame
    indices with numpy-exact per-frame stats."""
    from rios_spark.multimodal import _decode_video, gen_video, video_frame_sample

    media = gen_video(spark, 12)
    out = video_frame_sample(media, every_n=4).toPandas()
    src = media.select("media_id", "fmt", "payload").toPandas()
    assert set(out["media_id"]) == set(src["media_id"])
    for mid, payload, fmt in zip(src["media_id"], src["payload"], src["fmt"]):
        clip = _decode_video(bytes(payload), fmt).astype(np.float64)
        sel = np.arange(0, clip.shape[0], 4)
        grp = out[out["media_id"] == mid].sort_values("frame_idx")
        assert list(grp["frame_idx"]) == sel.tolist()
        gray = clip[sel].mean(axis=3)
        assert np.allclose(grp["mean_gray"].to_numpy(), gray.mean(axis=(1, 2)))
        assert np.allclose(grp["std_gray"].to_numpy(), gray.std(axis=(1, 2)))
    # a real-format payload raises the documented stub error
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(99, "video", "mp4", 1, 1, 3, 10, 100, b"\x00\x01\x02")],
        "media_id long, kind string, fmt string, width int, height int,"
        " n_channels int, sample_rate int, duration_ms int, payload binary",
    )
    with _pytest.raises(Exception, match="video codec"):
        video_frame_sample(bad).collect()
