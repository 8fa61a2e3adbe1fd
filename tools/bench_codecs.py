"""Real-codec decode throughput for the multimodal operators.

Measures the four REAL decode paths (PNG, baseline JPEG, mu-law WAV,
YUV4MPEG2) end-to-end through their mapInPandas operators on n_docs
generated fixtures: generation is materialized (cached + counted)
before timing so the rows measure decode + feature extraction, not
fixture synthesis.  Median-of-3 after one discarded warm-up run.

Usage: python tools/bench_codecs.py [n_docs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from riot_spark.multimodal import (
    audio_features,
    generate_media,
    generate_media_jpeg,
    generate_media_wav,
    generate_media_y4m,
    image_features,
    sample_frames,
)
from riot_spark.session import get_spark


def timed_median(fn, reps: int = 3) -> float:
    fn()  # discarded warm-up (codegen + Arrow path init)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return statistics.median(vals)


def main(n_docs: int) -> None:
    spark = get_spark("bench_codecs", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    ids = spark.range(n_docs).withColumnRenamed("id", "media_id")

    rows = []

    png = generate_media(ids).cache()
    png.count()
    t = timed_median(lambda: image_features(png, fake=False).count())
    rows.append(("png_decode_features_8x8", n_docs, t))

    jpg = generate_media_jpeg(ids).cache()
    jpg.count()
    t = timed_median(lambda: image_features(jpg, fake=False).count())
    rows.append(("jpeg_decode_features_16x16", n_docs, t))

    wav = generate_media_wav(ids).cache()
    wav.count()
    t = timed_median(lambda: audio_features(wav).count())
    rows.append(("wav_ulaw_decode_features_256smp", n_docs, t))

    y4m = generate_media_y4m(ids).cache()
    y4m.count()
    n_frames = sample_frames(y4m, every_ms=1000, fake=False).count()
    t = timed_median(
        lambda: sample_frames(y4m, every_ms=1000, fake=False).count()
    )
    rows.append((f"y4m_decode_sample_{n_frames}frames", n_docs, t))

    for name, n, sec in rows:
        print(f"{name}: {n} media in {sec:.3f} s = {n / sec:,.0f} media/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000)
