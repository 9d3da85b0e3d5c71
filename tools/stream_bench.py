"""Streaming ingest throughput micro-bench (VERDICT r6 #8).

The e2e replay tests prove the ingest streams CORRECT; this gives the
path a NUMBER like everything else: docs/sec (and vectors/sec) over 3
sequential micro-batches of the sf corpus through
``start_neardup_ingest_stream`` / ``start_embedding_ingest_stream``,
cold-start included in batch 1, steady state visible in batches 2-3
(which also carry the growing vs-corpus join).

Each batch is appended to the source dir and drained with an
availableNow trigger — the same harness shape as the pytest e2e runs,
sized at the bench corpus instead of toy rows.

Usage: python tools/stream_bench.py [out_json]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_BATCHES = 3


def _run_stream(spark, start_fn, src_schema, batches, work, reader_kwargs):
    """Append each batch frame to the source dir, drain it with an
    availableNow query, time the drain. Returns per-batch dicts."""
    src = os.path.join(work, "src")
    index_dir = os.path.join(work, "idx")
    pairs_dir = os.path.join(work, "pairs")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src, exist_ok=True)
    out = []
    for i, batch in enumerate(batches):
        n = batch.count()
        batch.write.mode("append").parquet(src)
        stream = spark.readStream.schema(src_schema).parquet(src)
        t0 = time.time()
        q = start_fn(stream, index_dir, pairs_dir, ckpt, **reader_kwargs)
        if not q.awaitTermination(600):
            # a still-running query would overlap the next iteration
            # on the same checkpoint AND make this batch's dt bogus —
            # fail loudly rather than report a wrong number
            q.stop()
            raise RuntimeError(
                f"batch {i} did not drain within 600s — bench invalid"
            )
        dt = time.time() - t0
        out.append(
            {
                "batch": i,
                "rows": n,
                "sec": round(dt, 3),
                "rows_per_sec": round(n / dt, 1),
            }
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.session import get_spark
    from datapipelinedemo_spark.streaming.dedup import (
        start_embedding_ingest_stream,
        start_neardup_ingest_stream,
    )

    spark = get_spark(app_name="stream_bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        doc_batches = [
            docs.filter(F.col("doc_id") % N_BATCHES == i).select(
                "doc_id", "text"
            )
            for i in range(N_BATCHES)
        ]
        text = _run_stream(
            spark,
            start_neardup_ingest_stream,
            "doc_id long, text string",
            doc_batches,
            os.path.join(work, "text"),
            {},
        )

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        vec_batches = [
            emb.filter(F.col("vec_id") % N_BATCHES == i).select(
                "vec_id", "embedding"
            )
            for i in range(N_BATCHES)
        ]
        vec = _run_stream(
            spark,
            start_embedding_ingest_stream,
            "vec_id long, embedding array<float>",
            vec_batches,
            os.path.join(work, "vec"),
            {},
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    payload = {
        "sf_dir": sf_dir,
        "neardup_text_ingest": text,
        "embedding_ingest": vec,
        "steady_docs_per_sec": round(
            sum(b["rows"] for b in text[1:])
            / max(1e-9, sum(b["sec"] for b in text[1:])),
            1,
        ),
        "steady_vectors_per_sec": round(
            sum(b["rows"] for b in vec[1:])
            / max(1e-9, sum(b["sec"] for b in vec[1:])),
            1,
        ),
    }
    print(json.dumps(payload, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
