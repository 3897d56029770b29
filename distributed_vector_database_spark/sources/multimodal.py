"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface for training-data pipelines: image/audio/video
content travels as a ``binary`` column with a typed metadata struct; decode /
feature-extraction / frame-sampling run as Arrow-batched ``mapInPandas``
stages. The Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested; the actual codecs are STUBBED — this container has no
image/audio libraries, so:

  - ``decode_image_meta`` parses a deterministic fake header this module
    itself writes (so tests exercise real bytes end-to-end);
  - ``decode_with_pillow`` raises NotImplementedError unless PIL is
    importable (the clearly-marked production hook).

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of blobs
fits executor memory, and always project metadata-only when content is not
needed (column pruning skips the blob bytes entirely in parquet).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "ASSET_SCHEMA",
    "synth_assets",
    "decode_image_meta",
    "image_features",
    "frame_sample",
    "resize_images",
    "payload_stats",
    "dhash_bits",
    "dhash_fingerprints",
    "decode_with_pillow",
]

ASSET_SCHEMA = (
    "asset_id long, modality string, mime string, content binary"
)

_MAGIC = b"DVDB"


def _fake_image_bytes(asset_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image: 12-byte header + pseudo pixel bytes."""
    header = _MAGIC + struct.pack("<HH", width, height)
    n = min(width * height, 256)
    body = bytes((asset_id * 31 + i * 7) % 256 for i in range(n))
    return header + body


def synth_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake multimodal table (images only for now)."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 8
        rows.append((i, "image", "image/x-dvdb", _fake_image_bytes(i, w, h)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """mapInPandas decode stage: parse (width, height) from the content
    header, emit metadata + payload size. Real Arrow batch plumbing; the
    header format is this module's own deterministic fake."""
    schema = "asset_id long, width int, height int, n_bytes long, valid boolean"

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "asset_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "valid": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                ok = len(b) >= 8 and b[:4] == _MAGIC
                w, h = struct.unpack("<HH", b[4:8]) if ok else (0, 0)
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(b))
                out["valid"].append(ok)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "content").mapInPandas(decode, schema)


def image_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic 'feature extraction': a dim-length float vector from
    payload byte histograms (stands in for a CNN embedding; the output feeds
    the SAME ANN/dedup operators as text embeddings)."""
    schema = f"asset_id long, features array<float>"

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, feats = [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = np.frombuffer(bytes(content)[8:], dtype=np.uint8)
                if len(b) == 0:
                    v = np.zeros(dim, dtype=np.float32)
                else:
                    hist, _ = np.histogram(b, bins=dim, range=(0, 256))
                    v = hist.astype(np.float64)
                    nrm = np.linalg.norm(v)
                    v = (v / nrm if nrm > 0 else v).astype(np.float32)
                ids.append(aid)
                feats.append(v.tolist())
            yield pd.DataFrame({"asset_id": ids, "features": feats})

    return assets.select("asset_id", "content").mapInPandas(extract, schema)


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub: emit one row per sampled offset of the payload
    (the video analogue — one row per sampled frame). Demonstrates the
    1-to-N mapInPandas expansion shape."""
    schema = "asset_id long, frame_ix int, offset long, byte int"

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"asset_id": [], "frame_ix": [], "offset": [], "byte": []}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)[8:]
                for ix, off in enumerate(range(0, len(b), every_n_bytes)):
                    rows["asset_id"].append(aid)
                    rows["frame_ix"].append(ix)
                    rows["offset"].append(off)
                    rows["byte"].append(b[off])
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "content").mapInPandas(sample, schema)


def resize_images(
    assets: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """'Resize' stage: re-emit each asset with a payload downsampled to
    ``width*height`` bytes (deterministic stride sampling over the body —
    the real op would be a Pillow/libvips resize; this container has no
    image codecs, so the TRANSFORM is stubbed while the Spark plumbing is
    real: binary in -> binary out, schema carries the new dims, narrow
    mapInPandas, partition layout preserved).

    Batch shape note: payloads stay inside the Arrow batch; nothing is
    collected. At 100 TB, cap ``spark.sql.execution.arrow.maxRecordsPerBatch``
    so batch_bytes = records x payload fits executor memory.
    """
    schema = "asset_id long, width int, height int, content binary"
    target = width * height

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                b = np.frombuffer(bytes(content)[8:], dtype=np.uint8)
                if len(b) == 0:
                    out = np.zeros(target, dtype=np.uint8)
                else:
                    # stride sample = nearest-neighbor "resize" of the body
                    ix = np.linspace(0, len(b) - 1, target).astype(np.int64)
                    out = b[ix]
                ids.append(aid)
                ws.append(width)
                hs.append(height)
                outs.append(out.tobytes())
            yield pd.DataFrame(
                {"asset_id": ids, "width": ws, "height": hs, "content": outs}
            )

    return assets.select("asset_id", "content").mapInPandas(resize, schema)


def payload_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
    frame_bytes: int = 64,
) -> DataFrame:
    """Generic binary-payload metadata stage (the decode step every
    multimodal pipeline starts with): size, frame count at a fixed stride,
    and byte checksum — computed from the raw bytes in an Arrow-batched
    ``mapInPandas`` so the oracle can verify the plumbing end-to-end.
    """
    schema = f"{id_col} long, n_bytes long, n_frames long, byte_sum long"

    def stats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, nb, nf, bs = [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content)
                ids.append(rid)
                nb.append(len(b))
                nf.append((len(b) + frame_bytes - 1) // frame_bytes)
                bs.append(
                    int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64))
                )
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_frames": nf, "byte_sum": bs}
            )

    return df.select(id_col, content_col).mapInPandas(stats, schema)


def dhash_bits(payload: bytes, blocks: int = 64) -> int:
    """Pure-python reference for one payload's dHash (used by the Arrow
    stage below and by tests): split the bytes into ``blocks + 1`` equal
    spans (floor boundaries i*L//(blocks+1)) and set bit ``63 - i`` iff
    mean(span i) > mean(span i+1) — the classic difference-hash
    gradient-sign fingerprint (pixel-average comparisons), applied to
    raw payload bytes instead of resized pixel rows. Means are compared
    CROSS-MULTIPLIED (sum_i * len_{i+1} > sum_{i+1} * len_i), so the
    whole fingerprint is exact integer math — floor boundaries make
    span lengths differ by one, and comparing raw sums would tattoo
    that length pattern into every fingerprint (a constant payload
    must hash to 0).
    """
    n = blocks + 1
    length = len(payload)
    bounds = [i * length // n for i in range(n + 1)]
    sums = [sum(payload[bounds[i] : bounds[i + 1]]) for i in range(n)]
    lens = [bounds[i + 1] - bounds[i] for i in range(n)]
    fp = 0
    for i in range(blocks):
        if sums[i] * lens[i + 1] > sums[i + 1] * lens[i]:
            fp |= 1 << (blocks - 1 - i)
    return fp


def dhash_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
    min_bytes: int = 65,
) -> DataFrame:
    """64-bit perceptual difference-hash (dHash) of a binary payload,
    as a 16-hex-char string: 65 equal byte-spans, bit i = 1 iff
    mean(span i) > mean(span i+1), compared cross-multiplied so the
    whole fingerprint is exact integer math (see :func:`dhash_bits`).
    Two payloads differing only in small local edits keep most gradient
    signs, so near-identical binaries land within a few bit flips — the
    image/audio near-dup screen that token-level SimHash cannot see
    (binary columns have no tokens).

    Computed in an Arrow-batched ``mapInPandas`` (one cumulative-sum
    pass over the bytes per payload); the fingerprint frame then feeds
    ``dedup.hamming_band_pairs`` exactly like SimHash.

    Payloads shorter than ``min_bytes`` (default 65 — fewer bytes than
    block boundaries, so most gradient bits are vacuously 0) get a NULL
    dhash instead of a degenerate near-zero fingerprint: on a real asset
    mix every tiny/empty file would otherwise collide at hamming 0 and
    flood the near-dup screen with false pairs (ADVICE r9).
    ``hamming_band_pairs`` drops NULL fingerprints before banding.
    """
    schema = f"{id_col} long, dhash string"

    def fps(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hx = [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content)
                length = len(b)
                if length < min_bytes:
                    ids.append(rid)
                    hx.append(None)
                    continue
                bounds = np.array(
                    [i * length // 65 for i in range(66)], dtype=np.int64
                )
                cs = np.zeros(length + 1, dtype=np.int64)
                np.cumsum(
                    np.frombuffer(b, dtype=np.uint8), out=cs[1:]
                )
                sums = cs[bounds[1:]] - cs[bounds[:-1]]
                lens = bounds[1:] - bounds[:-1]
                bits = sums[:-1] * lens[1:] > sums[1:] * lens[:-1]
                fp = 0
                for i in range(64):
                    if bits[i]:
                        fp |= 1 << (63 - i)
                ids.append(rid)
                hx.append(f"{fp:016x}")
            yield pd.DataFrame({id_col: ids, "dhash": hx})

    return df.select(id_col, content_col).mapInPandas(fps, schema)


def decode_with_pillow(assets: DataFrame) -> DataFrame:
    """Production decode hook: real image decoding via Pillow.

    Same Arrow ``mapInPandas`` shape as :func:`decode_image_meta`, but the
    payload is parsed by PIL instead of this module's fake header — so any
    real PNG/JPEG/etc. binary column decodes to
    ``(asset_id, width, height, mode, format, valid)``. Undecodable
    payloads yield ``valid = false`` rather than failing the job (a 100 TB
    crawl always contains corrupt blobs).

    Raises NotImplementedError at plan time when PIL is absent in this
    environment (the driver check mirrors the executors' environment in
    local mode; on a real cluster, ship PIL with the executors).
    """
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Pillow is not installed in this environment; use "
            "decode_image_meta/image_features (deterministic fakes) or "
            "install PIL on the executors."
        ) from e

    schema = (
        "asset_id long, width int, height int, mode string, "
        "format string, valid boolean"
    )

    def decode(batches: Iterator) -> Iterator:
        import io

        import pandas as pd
        from PIL import Image

        for pdf in batches:
            out = {
                "asset_id": [],
                "width": [],
                "height": [],
                "mode": [],
                "format": [],
                "valid": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                try:
                    with Image.open(io.BytesIO(bytes(content))) as im:
                        w, h = im.size
                        mode, fmt, ok = im.mode, im.format or "", True
                except Exception:
                    w = h = 0
                    mode = fmt = ""
                    ok = False
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append(mode)
                out["format"].append(fmt)
                out["valid"].append(ok)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "content").mapInPandas(decode, schema)
