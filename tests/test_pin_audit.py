"""Pin-site marker discipline gate (VERDICT r15 Next #4).

The broadcast gate's acknowledged blind spot is a ``pin()``-ed frame
(lineage truncates to ``Scan ExistingRDD`` at plan time), and the r15
``minhash_estimate_error`` defect — a corpus-grain pin carrying the
wide ``__sh`` shingle array, unmarked — slipped in exactly there one
round after pin.py's policy exception was codified. Two layers close
it:

- static: ``tools.pin_audit`` walks every ``pin(`` /
  ``.transform(pin)`` call site in the package; each must carry a
  ``# pin-bounded: <reason>`` or ``# narrow-pin: <width>`` marker
  (test 1, plus a planted-violation test proving the walker sees
  unmarked sites).
- runtime: ``pin()`` reads the calling site's marker and REFUSES a
  narrow-pin frame carrying unbounded-width columns
  (array/map/struct/binary) — the exact r15 shape (test 3).
"""

from __future__ import annotations

import os
import sys
import textwrap

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pin_audit import audit_pins, pin_sites


def test_every_pin_site_is_marked():
    bad = audit_pins()
    assert not bad, f"unmarked pin() call sites: {bad}"


def test_walker_sees_planted_unmarked_site(tmp_path):
    pkg = tmp_path / "fakepkg"
    pkg.mkdir()
    (pkg / "mod.py").write_text(
        textwrap.dedent(
            """
            from datapipelinedemo_spark.pin import pin

            def marked(df):
                return df.transform(pin)  # pin-bounded: planted

            def unmarked(df):
                return pin(df)
            """
        )
    )
    sites = pin_sites(str(pkg))
    assert len(sites) == 2
    bad = audit_pins(str(pkg))
    assert len(bad) == 1 and bad[0]["line"] == 8


@pytest.fixture()
def planted(tmp_path):
    """Import a planted module with one narrow-pin and one bounded
    site, so the runtime marker lookup resolves real source lines."""
    mod = tmp_path / "planted_pins.py"
    mod.write_text(
        textwrap.dedent(
            """
            from datapipelinedemo_spark.pin import pin

            def narrow(df):
                return pin(  # narrow-pin: planted test site
                    df
                )

            def narrow_via_transform(df):
                return df.transform(pin)  # narrow-pin: planted

            def bounded(df):
                return pin(df)  # pin-bounded: planted test site
            """
        )
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location("planted_pins", mod)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_narrow_pin_rejects_unbounded_width_columns(spark, planted):
    """The r15 shape: a narrow-pin-marked site pinning a frame that
    carries an ARRAY column must fail fast — in both call forms."""
    from pyspark.sql import functions as F

    wide = spark.range(3).select(
        "id", F.array(F.lit(1), F.lit(2)).alias("__sh")
    )
    with pytest.raises(ValueError, match="narrow-pin.*__sh"):
        planted.narrow(wide)
    with pytest.raises(ValueError, match="narrow-pin.*__sh"):
        planted.narrow_via_transform(wide)

    narrow_ok = spark.range(3).select("id", (F.col("id") * 2).alias("sig"))
    out = planted.narrow(narrow_ok)
    assert out.count() == 3

    # bounded sites may pin anything — cardinality is the claim there
    out2 = planted.bounded(wide)
    assert out2.count() == 3
