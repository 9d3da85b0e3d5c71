"""Generate the deterministic tweet fixture (FIXTURES.md §B1) at
fixtures/tweets.parquet — seeded, ~1400 rows, exercising every
enrichment code path (short/long/null/garbage timestamps, K/M/garbage
counts, all 7 keywords + unknown + malformed URLs, 0/1/many phrase
matches incl. overlaps and multi-token patterns).

The fixture is committed so the tweets-pipeline catalog queries and
their DuckDB oracles read the identical bytes.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "tweets.parquet")

# (month name, day, year) → labels 2018-1, 2018-3, 2019-2, 2019-7 and
# short forms (→2020): Mar → 2020-3, Sep → 2020-9
LONG_DATES = [
    ("Jan", 2018), ("Mar", 2018), ("Feb", 2019), ("Jul", 2019),
]
SHORT_MONTHS = ["Mar", "Sep"]

# demo.py:122-131 exact map: coke/pop -> ginger ale; club soda /
# soda water are NOT mapped (unknown -> Category2 'None', rows kept)
KEYWORDS = [
    ("soda", "soda"), ("sparkling%20water", "soda"),
    ("fizzy%20drink", "soda"), ("tonic", "tonic"),
    ("ginger%20ale", "ginger ale"), ("coke", "ginger ale"),
    ("pop", "ginger ale"),
]
UNKNOWN_KW = ["coffee", "tea%20leaf", "club%20soda", "soda%20water"]

# phrase vocab (tweets_catalog.PATTERNS must match): unigrams
# soda/tonic/sugar/butter/olive/ginger, bigrams "ginger ale"/"olive oil"
PHRASE_SNIPPETS = [
    "soda", "tonic", "sugar", "butter", "ginger ale", "olive oil",
    "olive", "ginger", "soda sugar", "ginger ale tonic butter",
    "olive oil sugar soda", "butter butter soda", "ginger ginger ale",
]
SENTIMENT_WORDS = ["good", "love", "bad", "awful", "flat"]
FILLERS = ["drinking", "some", "today", "really", "my", "favorite", "the"]


def make_rows(n: int = 1400, seed: int = 42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            ts = None
        elif r < 0.12:
            ts = "not a date"
        elif r < 0.40:
            m = SHORT_MONTHS[rng.randrange(2)]
            ts = f"{m} {rng.randint(1, 9)}"  # len<8 → " 2020" appended
        else:
            m, y = LONG_DATES[rng.randrange(len(LONG_DATES))]
            ts = f"{m} {rng.randint(1, 28)}, {y}"

        words = []
        k = rng.randrange(4)
        for _ in range(k):
            words.append(PHRASE_SNIPPETS[rng.randrange(len(PHRASE_SNIPPETS))])
        for _ in range(rng.randrange(3)):
            words.append(FILLERS[rng.randrange(len(FILLERS))])
        if rng.random() < 0.6:
            words.append(SENTIMENT_WORDS[rng.randrange(len(SENTIMENT_WORDS))])
        rng.shuffle(words)
        text = " ".join(words) if words else "nothing here"

        def count():
            r2 = rng.random()
            if r2 < 0.15:
                return None
            if r2 < 0.30:
                return f"{rng.randint(1, 99) / 10:.1f}K"
            if r2 < 0.38:
                return f"{rng.randint(1, 40) / 10:.1f}M"
            if r2 < 0.45:
                return "garbage"
            return str(rng.randint(0, 5000))

        r3 = rng.random()
        if r3 < 0.06:
            url = None
        elif r3 < 0.12:
            url = "https://x.example/nomatch"
        elif r3 < 0.2:
            kw = UNKNOWN_KW[rng.randrange(len(UNKNOWN_KW))]
            url = f"https://x.example/search?searchq={kw}%20until%202020-01-01"
        else:
            kw, _ = KEYWORDS[rng.randrange(len(KEYWORDS))]
            lang = "%20lang%3Aen" if rng.random() < 0.5 else ""
            url = (
                f"https://x.example/search?searchq={kw}{lang}"
                f"%20until%202020-01-01"
            )
        rows.append((ts, text, count(), count(), count(), url))
    return rows


def main() -> None:
    rows = make_rows()
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "Timestamp": pa.array(cols[0], pa.string()),
            "Text": pa.array(cols[1], pa.string()),
            "Comments": pa.array(cols[2], pa.string()),
            "Likes": pa.array(cols[3], pa.string()),
            "Retweets": pa.array(cols[4], pa.string()),
            "Page_URL": pa.array(cols[5], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(tbl, OUT, compression="snappy")
    print(f"wrote {tbl.num_rows} rows to {OUT}")


if __name__ == "__main__":
    main()
