"""CLI for streaming ingest-index compaction.

Folds a stopped ingest stream's per-micro-batch ``batch_id=N/``
partitions into the ``batch_id=-1`` seed partition (see
``datapipelinedemo_spark/streaming/compact.py`` for the crash-safety
contract). Run between ``availableNow`` runs or in a maintenance
window — never against a live stream.

Usage:
    python tools/index_compact.py INDEX_DIR [--target-mb 128] [--all]

``--all`` also folds the newest batch partition (safe only when the
last run's checkpoint is known committed).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from datapipelinedemo_spark.session import get_spark
    from datapipelinedemo_spark.streaming.compact import compact_ingest_index

    spark = get_spark(app_name="index_compact")
    audit = compact_ingest_index(
        spark,
        args.index_dir,
        target_bytes=args.target_mb << 20,
        keep_latest=not args.all,
    )
    print(audit)
    spark.stop()


if __name__ == "__main__":
    main()
