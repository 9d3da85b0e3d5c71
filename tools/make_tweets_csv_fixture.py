"""Generate the messy multi-file CSV form of the tweet fixture at
fixtures/tweets_csv/part-{0,1,2}.csv — the S1 entry-point shape the
reference actually reads (demo.py:53 reads a directory of CSVs with
header). Rows come from the committed fixtures/tweets.parquet split
round-robin across 3 files, so multi-file globbing, header-per-file,
quoted commas ("Jan 05, 2018"), and empty-field nulls are all
exercised by the oracle gate.

Deterministic: same parquet in → same CSV bytes out. Nulls are written
as fully empty fields (both Spark's csv reader and DuckDB's read_csv
map empty → NULL by default); the fixture contains no empty-but-not-
null strings, so the round trip is lossless.
"""

from __future__ import annotations

import csv
import os

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "fixtures", "tweets.parquet")
OUT_DIR = os.path.join(ROOT, "fixtures", "tweets_csv")
N_FILES = 3
COLUMNS = ["Timestamp", "Text", "Comments", "Likes", "Retweets", "Page_URL"]


def main() -> None:
    tbl = pq.read_table(SRC)
    rows = tbl.to_pylist()
    os.makedirs(OUT_DIR, exist_ok=True)
    writers = []
    files = []
    for i in range(N_FILES):
        f = open(
            os.path.join(OUT_DIR, f"part-{i}.csv"), "w", newline="", encoding="utf-8"
        )
        files.append(f)
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        w.writerow(COLUMNS)
        writers.append(w)
    for i, r in enumerate(rows):
        writers[i % N_FILES].writerow(
            ["" if r[c] is None else r[c] for c in COLUMNS]
        )
    for f in files:
        f.close()
    print(f"wrote {len(rows)} rows across {N_FILES} files in {OUT_DIR}")


if __name__ == "__main__":
    main()
