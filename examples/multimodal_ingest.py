"""Multimodal ingest demo — the binary-column pipeline a mixed-media
training-data run executes, wired from the library's REAL codecs:

    payload synthesis (PNG / GIF / WAV / opaque) → format sniff +
    header parse → image decode + intensity features → audio feature
    extraction → per-format quality summary

Run:  python examples/multimodal_ingest.py [sf_dir]
(default: /root/testdata/sf0.001)

The container ships no image/audio fixtures, so the demo synthesizes
payloads from ``documents.text`` bytes with the library's conformant
encoders (any external viewer opens them) — in production the binary
column comes straight from the lakehouse.  Every decode runs inside
``mapInPandas``: partition-parallel, Arrow-batched, payload bytes
never leave the executor, corrupt files degrade to NULL-stats rows
instead of killing the pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from fletcher_spark import get_spark
from fletcher_spark.io import load_tables
from fletcher_spark.pipeline import multimodal as MM


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")

    # 1. synthesize a mixed-media lake: each doc becomes a PNG, a GIF,
    #    a WAV, or stays an opaque blob, keyed by doc_id % 4
    import pandas as pd

    png_enc = MM._make_png_encode(32)
    gif_enc = MM._make_gif_encode(32)
    wav_enc = MM._make_wav_encode(8000)

    def synthesize(it):
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                kind = doc_id % 4
                if kind == 0:
                    payloads.append(png_enc(data))
                elif kind == 1:
                    payloads.append(gif_enc(data))
                elif kind == 2:
                    payloads.append(wav_enc(data))
                else:
                    payloads.append(data)  # opaque blob
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    lake = docs.mapInPandas(synthesize, "doc_id long, payload binary")

    # 2. cheap JVM-side tier first: sniff formats / parse headers
    #    without any Python decode (fixed-offset dims for PNG/GIF)
    dims = MM.image_dimensions(lake)
    print("== header-parse tier (JVM-side for PNG/GIF) ==")
    dims.groupBy("format").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("width").alias("max_w"),
        F.max("height").alias("max_h"),
    ).orderBy("format").show()

    # 3. real image decode: true dims + 16-bucket intensity histogram
    decoded = MM.decode_images(lake)
    print("== image decode tier (real PNG/GIF codecs) ==")
    decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feat", 3), 4).alias("feat2"),
    ).where(F.col("width").isNotNull()).show(5)

    # 4. real audio features over the WAV slice
    audio = MM.audio_features(lake)
    print("== audio tier (RIFF PCM decode) ==")
    audio.where(F.col("n_frames").isNotNull()).select(
        "doc_id",
        "sample_rate",
        "n_frames",
        F.round("rms", 4).alias("rms"),
        F.round("peak", 4).alias("peak"),
        "zero_cross",
    ).show(5)

    # 5. ingest-quality summary: real-codec coverage vs fake-tier and
    #    audio rows (joins the header sniff with the decode results)
    summary = (
        decoded.join(dims.select("doc_id", "format"), "doc_id", "left")
        .select(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum(
                (F.col("format").isNotNull() & F.col("width").isNotNull()).cast("long")
            ).alias("n_real_image_decodes"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
    print("== decode-coverage summary ==")
    summary.show()
    spark.stop()


if __name__ == "__main__":
    main()
