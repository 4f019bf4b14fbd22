"""spark-submit entrypoint for the flagship windowed audio pipeline.

Cluster-style launch (north rule):

    make package   # builds dist/dataflows_spark.zip
    spark-submit --master local[32] \
        --py-files dist/dataflows_spark.zip \
        scripts/submit_pipeline.py \
        --clips <parquet path or 'synth:N'> --out <dir> [--stream]

On a real cluster, swap --master for yarn/k8s and point --clips at the
Iceberg table; nothing else changes. The script has no repo-relative
imports — everything comes from the shipped zip.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True, help="parquet path, or synth:N to generate N clips")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--stream", action="store_true", help="run as a streaming query (file source)")
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--watermark", default="10 minutes")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("dataflows_spark_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from dataflows_spark.functions import audio
    from dataflows_spark.streaming import ExactlyOnceParquetSink, tumbling_window_agg

    t0 = time.time()
    if args.clips.startswith("synth:"):
        from dataflows_spark.sources.clips import clips_df

        clips = clips_df(spark, int(args.clips[6:]), dur_min=100, dur_max=400)
    elif args.stream:
        from dataflows_spark.sources.clips import CLIPS_SCHEMA

        clips = spark.readStream.schema(CLIPS_SCHEMA).parquet(args.clips)
    else:
        clips = spark.read.parquet(args.clips)

    valid = clips.filter(audio.duration_valid_col())
    feats = valid.withColumn("st", audio.decode_stats("bytes", "codec")).select(
        "codec",
        "event_time",
        F.col("st.rms").alias("rms"),
        F.col("st.n_samples").alias("n_samples"),
    )
    agg = tumbling_window_agg(
        feats,
        "event_time",
        args.window,
        ["codec"],
        {
            "n_clips": {"aggregate": "count"},
            "mean_rms": {"name": "rms", "aggregate": "avg"},
            "total_samples": {"name": "n_samples", "aggregate": "sum"},
        },
        watermark=args.watermark if args.stream else None,
    )

    if args.stream:
        sink = ExactlyOnceParquetSink(args.out)
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", args.checkpoint or f"{args.out}/_checkpoint")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        print(json.dumps({"mode": "stream", "batches": sink.committed_batches(), "sec": round(time.time() - t0, 2)}))
    else:
        agg.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).agg(F.sum("n_clips")).collect()[0][0]
        print(json.dumps({"mode": "batch", "clips": int(n or 0), "sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
