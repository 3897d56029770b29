"""Multimodal plumbing: binary payload schema, mapInPandas decode batches,
feature extraction shape, 1-to-N frame sampling."""

import pytest
from pyspark.sql import functions as F

from distributed_vector_database_spark.sources.multimodal import (
    synth_assets,
    decode_image_meta,
    image_features,
    frame_sample,
    decode_with_pillow,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synth_assets(spark, n=32).repartition(4).cache()


def test_decode_meta(assets):
    meta = {r["asset_id"]: r for r in decode_image_meta(assets).collect()}
    assert len(meta) == 32
    for i in range(32):
        r = meta[i]
        assert r["valid"]
        assert r["width"] == 16 + (i % 8) * 4
        assert r["height"] == 16 + (i % 5) * 8
        assert r["n_bytes"] > 8


def test_image_features_shape_and_norm(assets):
    rows = image_features(assets, dim=16).collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["features"]) == 16
        nrm = sum(x * x for x in r["features"]) ** 0.5
        assert nrm == pytest.approx(1.0, abs=1e-5)


def test_features_feed_vector_ops(spark, assets):
    """Multimodal features flow into the same top-k operator as text/emb."""
    from distributed_vector_database_spark.operators.topk import topk

    feats = image_features(assets, dim=16)
    q = feats.filter(F.col("asset_id") == 0).head()["features"]
    res = topk(feats, q, k=3, vector_col="features", id_col="asset_id")
    rows = res.collect()
    assert rows[0]["asset_id"] == 0  # self-match first
    assert rows[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_frame_sample_counts(assets):
    per = (
        frame_sample(assets, every_n_bytes=64)
        .groupBy("asset_id")
        .count()
        .collect()
    )
    assert len(per) == 32
    assert all(r["count"] >= 1 for r in per)


_HAS_PIL = True
try:
    import PIL  # noqa: F401
except ImportError:
    _HAS_PIL = False


@pytest.mark.skipif(_HAS_PIL, reason="PIL present: gate does not trigger")
def test_pillow_stub_raises(assets):
    with pytest.raises(NotImplementedError):
        decode_with_pillow(assets)


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed")
def test_pillow_decode_real_images(spark):
    """Production decode path, exercised whenever PIL exists: real PNG
    bytes decode to true dimensions; corrupt payloads yield valid=false
    instead of failing the job."""
    import io

    from PIL import Image

    rows = []
    for i, (w, h) in enumerate([(5, 3), (8, 8), (2, 7)]):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color=(i, i, i)).save(buf, format="PNG")
        rows.append((i, "image", "image/png", buf.getvalue()))
    rows.append((99, "image", "image/png", b"not an image"))
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, mime string, content binary"
    )
    out = {r["asset_id"]: r for r in decode_with_pillow(assets).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["valid"]) == (5, 3, True)
    assert (out[1]["width"], out[1]["height"]) == (8, 8)
    assert out[2]["format"] == "PNG"
    assert out[99]["valid"] is False and out[99]["width"] == 0


def test_resize_is_deterministic_and_fixed_size(spark):
    from distributed_vector_database_spark.sources.multimodal import (
        resize_images,
        synth_assets,
    )

    assets = synth_assets(spark, n=12)
    out = resize_images(assets, width=4, height=4).collect()
    assert len(out) == 12
    for r in out:
        assert (r["width"], r["height"]) == (4, 4)
        assert len(bytes(r["content"])) == 16
    again = {
        r["asset_id"]: bytes(r["content"])
        for r in resize_images(assets, width=4, height=4).collect()
    }
    for r in out:
        assert again[r["asset_id"]] == bytes(r["content"])


# ---------------------------------------------------------------------------
# Perceptual dHash over binary payloads (multimodal.dhash_fingerprints +
# dedup.hamming_band_pairs — the payload_dhash_pairs screen)
# ---------------------------------------------------------------------------


def test_dhash_bits_reference_properties():
    from distributed_vector_database_spark.sources.multimodal import dhash_bits

    # constant payload: every span mean equal -> no gradient -> 0
    assert dhash_bits(b"aaaa" * 100) == 0
    # monotone-increasing bytes: every mean below the next -> 0
    assert dhash_bits(bytes(range(130))) == 0
    # monotone-decreasing: every bit set
    assert dhash_bits(bytes(reversed(range(130)))) == 0xFFFFFFFFFFFFFFFF
    # degenerate payloads don't crash
    assert dhash_bits(b"") == 0
    assert dhash_bits(b"x") == 0
    # a 1-byte local edit flips at most a couple of gradient signs
    base = b"the quick brown fox jumps over the lazy dog " * 20
    edited = bytearray(base)
    edited[5] = ord("X")
    h = bin(dhash_bits(base) ^ dhash_bits(bytes(edited))).count("1")
    assert 0 <= h <= 3


def test_dhash_fingerprints_match_python_reference(spark):
    from distributed_vector_database_spark.sources.multimodal import (
        dhash_bits,
        dhash_fingerprints,
        synth_assets,
    )

    assets = synth_assets(spark, n=16)
    got = {
        r["asset_id"]: r["dhash"]
        for r in dhash_fingerprints(
            assets, id_col="asset_id"
        ).collect()
    }
    for row in assets.collect():
        exp = f"{dhash_bits(bytes(row['content'])):016x}"
        assert got[row["asset_id"]] == exp


def test_hamming_band_pairs_equal_brute_force(spark):
    """Pigeonhole exactness: for max_hamming <= bands-1 the banded join
    finds EXACTLY the brute-force pairs."""
    import random

    from distributed_vector_database_spark.operators.dedup import (
        hamming_band_pairs,
    )

    rng = random.Random(7)
    fps = [rng.getrandbits(64) for _ in range(40)]
    # plant near-dup structure: clones of fp[0] with 1..3 flips
    for i, flips in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        v = fps[0]
        for b in range(flips):
            v ^= 1 << (7 * b + 3)
        fps[i] = v
    df = spark.createDataFrame(
        [(i, f"{v:016x}") for i, v in enumerate(fps)],
        "doc_id long, dhash string",
    )
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["hamming"])
        for r in hamming_band_pairs(
            df, fp_col="dhash", max_hamming=3, bands=4
        ).collect()
    )
    exp = sorted(
        (i, j, bin(fps[i] ^ fps[j]).count("1"))
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if bin(fps[i] ^ fps[j]).count("1") <= 3
    )
    assert got == exp
    assert (0, 4, 4) not in got  # the 4-flip clone is beyond threshold


def test_hamming_band_pairs_validation(spark):
    import pytest as _pytest

    from distributed_vector_database_spark.operators.dedup import (
        hamming_band_pairs,
    )

    df = spark.createDataFrame(
        [(0, "0" * 16)], "doc_id long, dhash string"
    )
    with _pytest.raises(ValueError, match="max_hamming"):
        hamming_band_pairs(df, fp_col="dhash", max_hamming=4, bands=4)
    with _pytest.raises(ValueError, match="divide"):
        hamming_band_pairs(df, fp_col="dhash", max_hamming=2, bands=3)


def test_dhash_fingerprints_null_below_min_bytes(spark):
    """ADVICE r9: payloads shorter than min_bytes (default 65) must emit a
    NULL dhash — not the degenerate near-zero fingerprint that would pair
    every tiny file with every other at hamming 0 — and
    hamming_band_pairs must drop NULLs before banding."""
    from distributed_vector_database_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from distributed_vector_database_spark.sources.multimodal import (
        dhash_fingerprints,
    )

    long_a = b"the quick brown fox jumps over the lazy dog " * 5
    rows = [
        (0, b""),            # empty
        (1, b"tiny"),        # 4 bytes
        (2, b"x" * 64),      # one below the boundary
        (3, b"y" * 65),      # exactly at the boundary -> fingerprinted
        (4, long_a),
        (5, long_a),         # byte-identical twin of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r["dhash"] for r in dhash_fingerprints(df).collect()}
    assert got[0] is None and got[1] is None and got[2] is None
    assert got[3] is not None and got[4] is not None
    assert got[4] == got[5]
    fp = dhash_fingerprints(df)
    pairs = sorted(
        (r["doc_id_a"], r["doc_id_b"])
        for r in hamming_band_pairs(
            fp, fp_col="dhash", max_hamming=3, bands=4
        ).collect()
    )
    # ONLY the true twin pairs; no tiny-payload all-pairs flood, and no
    # accidental (2, 3)-style pair from constant-byte degenerate content
    assert pairs == [(4, 5)]
    # min_bytes=0 restores the old behavior for callers that want it
    all_fp = dhash_fingerprints(df, min_bytes=0)
    assert all_fp.filter("dhash IS NULL").count() == 0
