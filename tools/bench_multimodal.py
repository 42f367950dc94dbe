"""Throughput envelope for the multimodal kernels (r12): decode metadata
and real frame extraction over generated GIF/APNG/Y4M/PNG fixtures.

The stdlib codecs are pure-Python per-pixel loops — the honest cost of
zero-dependency honesty. This bench records assets/s and frames/s so the
100 TB story is a measured number: the mapInPandas seam is the
production swap point (Pillow-SIMD / ffmpeg drop in per executor without
touching the Spark plumbing, schema, or sampling semantics).

Usage: python tools/bench_multimodal.py [--assets 512]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", type=int, default=512)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from seqspark.pipeline.multimodal import (
        audio_features,
        decode_assets,
        dhash_images,
        make_real_apng_assets,
        make_real_assets,
        make_real_gif_assets,
        make_real_jpeg_assets,
        make_real_mjpeg_assets,
        make_real_y4m_assets,
        sample_frames,
    )

    n = args.assets
    fixtures = {
        "png_wav": make_real_assets(spark, n),
        "gif": make_real_gif_assets(spark, n),
        "apng": make_real_apng_assets(spark, n),
        "y4m": make_real_y4m_assets(spark, n),
        "jpeg": make_real_jpeg_assets(spark, n),
        "mjpeg": make_real_mjpeg_assets(spark, n),
    }
    # repartition so the Arrow batches spread over the executor threads
    fixtures = {
        k: v.repartition(int(cpus)).cache() for k, v in fixtures.items()
    }
    for v in fixtures.values():
        v.count()

    res = {"metric": "seqspark_multimodal_throughput", "assets": n,
           "cpus": int(cpus)}

    def rate(name, fn, unit_count):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        res[name] = {
            "sec": round(dt, 2),
            "per_sec": round(unit_count(out) / dt, 1),
            "rows": unit_count(out),
        }

    for kind, df in fixtures.items():
        rate(f"decode_{kind}",
             lambda df=df: decode_assets(df, fake=False).count(),
             lambda c: c)
    for kind in ("gif", "apng", "y4m", "mjpeg"):
        rate(f"frames_{kind}",
             lambda kind=kind: sample_frames(
                 fixtures[kind], n_samples=3, fake=False).count(),
             lambda c: c)
    rate("dhash_gif",
         lambda: dhash_images(fixtures["gif"], fake=False)
         .filter(F.col("dhash").isNotNull()).count(),
         lambda c: c)
    rate("dhash_jpeg",
         lambda: dhash_images(fixtures["jpeg"], fake=False)
         .filter(F.col("dhash").isNotNull()).count(),
         lambda c: c)
    rate("audio_features",
         lambda: audio_features(fixtures["png_wav"], fake=False)
         .filter(F.col("fingerprint").isNotNull()).count(),
         lambda c: c)

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
