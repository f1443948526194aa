"""Multimodal operators: resize round-trip geometry, video frame
sampling, audio features — real Spark plumbing over capsule codecs."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from web_crawler_spark import media as M
from web_crawler_spark.images import decode_png, synth_pixels, synthesize_images


def test_resize_images(spark):
    imgs = synthesize_images(spark, 12, neardup_every=0)
    out = M.resize_images(imgs, 16, 16)
    rows = out.collect()
    ok = [r for r in rows if r["decode_ok"]]
    assert len(ok) == 12
    for r in ok:
        assert (r["w"], r["h"]) == (16, 16) and r["fmt"] == "png"
        px = decode_png(bytes(r["bytes"]))
        assert px.shape == (16, 16, 3)
    # captions survive the transform
    caps = {r["image_id"]: r["caption"] for r in rows}
    src = {r["image_id"]: r["caption"] for r in imgs.collect()}
    assert caps == src


def test_resize_nearest_identity():
    px = synth_pixels("img_x", 24, 24)
    assert np.array_equal(M.resize_nearest(px, 24, 24), px)


def test_sample_frames(spark):
    frames = [synth_pixels(f"f{i}", 20, 12) for i in range(7)]
    vid = M.encode_video(frames)
    df = spark.createDataFrame(
        [("vid1", bytearray(vid)), ("bad", bytearray(b"not a video"))],
        "video_id string, bytes binary",
    )
    out = M.sample_frames(df, every_n=2).collect()
    good = sorted(
        (r["frame_idx"] for r in out if r["video_id"] == "vid1" and r["decode_ok"])
    )
    assert good == [0, 2, 4, 6]
    for r in out:
        if r["video_id"] == "vid1":
            assert (r["w"], r["h"]) == (20, 12)
            px = decode_png(bytes(r["bytes"]))
            assert np.array_equal(px, frames[r["frame_idx"]])
    bad = [r for r in out if r["video_id"] == "bad"]
    assert len(bad) == 1 and bad[0]["decode_ok"] is False


def test_audio_features(spark):
    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / rate) * 10000).astype(np.int16)
    silent = np.zeros(rate // 2, dtype=np.int16)
    df = spark.createDataFrame(
        [
            ("a_sine", bytearray(M.encode_audio(sine, rate))),
            ("a_silent", bytearray(M.encode_audio(silent, rate))),
            ("a_bad", bytearray(b"garbage")),
        ],
        "audio_id string, bytes binary",
    )
    rows = {r["audio_id"]: r for r in M.audio_features(df).collect()}
    s = rows["a_sine"]
    assert s["decode_ok"] and abs(s["duration_s"] - 1.0) < 1e-6
    assert abs(s["rms"] - 10000 / np.sqrt(2)) < 150
    assert 850 <= s["zero_crossings"] <= 890  # 440 Hz -> ~880 crossings/s
    assert rows["a_silent"]["rms"] == 0.0
    assert rows["a_bad"]["decode_ok"] is False
