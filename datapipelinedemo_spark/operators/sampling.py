"""Deterministic hash-mod sampling (training-data pipelines).

``df.sample()`` / ``rand()`` sampling is nondeterministic across runs,
partitionings, and engines — useless for reproducible corpus builds.
Hash-mod sampling keys the decision on the ROW ITSELF:

    keep iff  md5_long(key) % denom < round(fraction * denom)

Properties a data pipeline actually needs:
- reproducible everywhere (any engine that can md5 — the DuckDB oracle
  checks it bit-for-bit);
- a pure narrow filter: no shuffle, pushes into the scan stage,
  trivially parallel at 100 TB;
- nested samples: the 5% sample is a strict subset of the 10% sample
  (thresholds nest), so sweeps reuse work;
- stratified rates per group (e.g. downsample overrepresented
  languages) are just a CASE over the threshold.

``md5_long`` (not ``xxhash64``) so results are oracle-reproducible;
swap the hash for xxhash64 in production for the same reasons as
``operators.dedup.shingle_hashes``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.stable import md5_long

DENOM = 10_000  # rate resolution: 0.01%


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, DENOM) from the row key (+ salt so
    independent samples don't correlate)."""
    s = F.concat(key.cast("string"), F.lit("#" + salt))
    return F.pmod(md5_long(s), F.lit(DENOM))


def hash_mod_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed on ``key_col``."""
    thr = round(fraction * DENOM)
    return df.filter(_bucket(F.col(key_col), salt) < F.lit(thr))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic rates: e.g. keep 100% of low-resource
    languages and 5% of the dominant one."""
    thr: Column = F.lit(round(default * DENOM))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(round(frac * DENOM))
        ).otherwise(thr)
    return df.filter(_bucket(F.col(key_col), salt) < thr)
