"""Multimodal columns for training-data pipelines.

Images/audio/video ride through the engine as opaque BINARY columns
plus a typed metadata struct.  The Spark-side plumbing — schemas,
Arrow batch shape, partition sizing, UDF signatures — is real and
tested; the actual media decode is STUBBED: the container ships no
image/audio libraries, so `decode_image`/`decode_audio` raise
NotImplementedError unless a deterministic fake decoder is requested
(`fake=True`), which synthesizes pixel/sample arrays from the md5 of
the payload so downstream feature extraction is testable end-to-end.

Scale notes: media rows are fat — `media_repartition` targets a bytes
budget per partition (not a row count) so executor memory survives
100 MB videos; feature extraction is mapInPandas with small Arrow
batches to bound peak memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pixel fake: md5-seeded byte tiling (stands in for
    a real JPEG decode; same payload => same pixels)."""
    seed = hashlib.md5(payload).digest()
    base = np.frombuffer(seed, dtype=np.uint8)
    n = w * h * 3
    return np.resize(base, n).reshape(h, w, 3)


def _fake_pixels_batch(payloads: list[bytes], w: int, h: int) -> np.ndarray:
    """Batch twin of `_fake_pixels`: one md5 per payload (inherently
    per-row), then ONE fancy-index tiles every digest to (N, h, w, 3) —
    no per-row numpy churn."""
    digs = np.frombuffer(
        b"".join(hashlib.md5(p).digest() for p in payloads), dtype=np.uint8
    ).reshape(len(payloads), 16)
    idx = np.arange(w * h * 3) % 16
    return digs[:, idx].reshape(len(payloads), h, w, 3)


def _metas_wh(metas) -> list[tuple[int, int]]:
    out = []
    for m in metas:
        if not isinstance(m, dict):
            m = m.asDict() if m is not None else {}
        out.append(((m.get("width") or 8), (m.get("height") or 8)))
    return out


def _wh_groups(whs: list[tuple[int, int]]) -> dict[tuple[int, int], list[int]]:
    groups: dict[tuple[int, int], list[int]] = {}
    for i, wh in enumerate(whs):
        groups.setdefault(wh, []).append(i)
    return groups


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_pixels(payload, meta.get("width") or 8, meta.get("height") or 8)
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL (not in this container); "
            "use fake=True for the deterministic stub"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


def image_features(
    media: DataFrame, fake: bool = True, batch_rows: int = 64
) -> DataFrame:
    """(media_id, mean_r, mean_g, mean_b, brightness) via mapInPandas.

    Small Arrow batches keep peak memory = batch_rows * payload size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                if not fake:
                    # real-decode path stays per-row (codec call is
                    # per-payload anyway)
                    out = []
                    for mid, payload, meta in zip(
                        chunk["media_id"], chunk["payload"], chunk["meta"]
                    ):
                        if not isinstance(meta, dict):
                            meta = meta.asDict() if meta is not None else {}
                        px = decode_image(bytes(payload), meta, fake=False)
                        means = px.reshape(-1, 3).mean(axis=0)
                        out.append(
                            (int(mid), float(means[0]), float(means[1]),
                             float(means[2]), float(px.mean()))
                        )
                    yield pd.DataFrame(
                        out,
                        columns=["media_id", "mean_r", "mean_g", "mean_b",
                                 "brightness"],
                    )
                    continue
                # fake path: batch numpy — md5 per row, then one tiled
                # fancy-index + axis means per (w, h) shape group
                payloads = [bytes(p) for p in chunk["payload"]]
                res = np.empty((len(chunk), 4), dtype=np.float64)
                for (w, h), idxs in _wh_groups(
                    _metas_wh(chunk["meta"])
                ).items():
                    px = _fake_pixels_batch(
                        [payloads[i] for i in idxs], w, h
                    ).astype(np.float64)
                    flat = px.reshape(len(idxs), -1, 3)
                    res[idxs, :3] = flat.mean(axis=1)
                    res[idxs, 3] = flat.reshape(len(idxs), -1).mean(axis=1)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(np.int64),
                        "mean_r": res[:, 0],
                        "mean_g": res[:, 1],
                        "mean_b": res[:, 2],
                        "brightness": res[:, 3],
                    }
                )

    cols = media.select("media_id", "payload", "meta")
    return cols.mapInPandas(
        run,
        schema=(
            "media_id LONG, mean_r DOUBLE, mean_g DOUBLE, "
            "mean_b DOUBLE, brightness DOUBLE"
        ),
    )


def resize_images(media: DataFrame, w: int, h: int, fake: bool = True) -> DataFrame:
    """(media_id, payload BINARY) — nearest-neighbor resize of the
    decoded pixels, re-emitted as raw RGB bytes + updated meta."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                ids, outs = [], []
                for mid, payload, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]
                ):
                    if not isinstance(meta, dict):
                        meta = meta.asDict() if meta is not None else {}
                    px = decode_image(bytes(payload), meta, fake=False)
                    ys = (np.arange(h) * px.shape[0] // h).clip(0, px.shape[0] - 1)
                    xs = (np.arange(w) * px.shape[1] // w).clip(0, px.shape[1] - 1)
                    outs.append(px[np.ix_(ys, xs)].tobytes())
                    ids.append(int(mid))
                yield pd.DataFrame({"media_id": ids, "payload": outs})
                continue
            # fake path: batch tile + one vectorized gather per shape
            payloads = [bytes(p) for p in pdf["payload"]]
            outs_arr: list[bytes | None] = [None] * len(pdf)
            for (w0, h0), idxs in _wh_groups(_metas_wh(pdf["meta"])).items():
                px = _fake_pixels_batch([payloads[i] for i in idxs], w0, h0)
                ys = (np.arange(h) * h0 // h).clip(0, h0 - 1)
                xs = (np.arange(w) * w0 // w).clip(0, w0 - 1)
                resized = np.ascontiguousarray(px[:, ys][:, :, xs])
                for row, i in enumerate(idxs):
                    outs_arr[i] = resized[row].tobytes()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "payload": outs_arr,
                }
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, schema="media_id LONG, payload BINARY"
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """video -> (media_id, frame_idx, ts_ms) frame-sampling plan rows.

    With a real decoder each row would carry frame pixels; the stub
    emits the sampling schedule (schema-complete, payload-free)."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
    )


def media_repartition(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition fat binary rows to a bytes budget per partition."""
    total = media.select(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return media.repartition(n)
