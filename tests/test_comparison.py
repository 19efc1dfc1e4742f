"""The reference's published Comparison benchmark as a regression
test: fill two StPetersburg gap ladders with the published config
(SVR/Biome/RandomGridSearch, Comparison/Description.md:26-27) and
assert gap-pixels-only MAE within an envelope of the reference's own
committed fills. The full 3-site × 8-ladder table lives in
BENCH/COMPARISON.md (scripts/comparison_bench.py); round-2 measured
deltas vs the reference are +0.03..+0.10 °C across all 24 ladders
(its RNG is unseeded, ours seeded; its SVR is libsvm, ours dual-CD
linear), so the 0.15 °C envelope has real margin without being
vacuous — both published competitors sit 0.3-2.0 °C higher."""

import os

import pytest

REF = "/root/reference/Comparison"

ENVELOPE = 0.15  # °C above the reference's committed MAE


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_comparison_mae_within_envelope(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from comparison_bench import run_site

    res = run_site(spark, "StPetersburg", pcts=[4, 15])
    for pct in (4, 15):
        r = res[pct]
        assert r["mae"] <= r["ref_mae_committed"] + ENVELOPE, (pct, r)
        # sanity: convention check — committed ref matches published
        assert abs(r["ref_mae_committed"] - r["ref_mae_published"]) < 0.01


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
@pytest.mark.parametrize("site,pcts", [
    ("StPetersburg", [6, 52, 96]),
    ("Madrid", [5, 50, 94]),
    ("Vladivostok", [5, 50, 93]),
])
def test_comparison_mae_all_ladders(spark, site, pcts):
    """All three sites gate the envelope at a low/mid/high ladder
    sample (round-2 VERDICT #6: StPetersburg 4/15 alone let Madrid /
    Vladivostok regressions pass silently). The full 24-ladder sweep
    was run green on 2026-08-17 (17:47); the sample keeps the default
    suite under ~10 min — extend pcts for a full audit."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from comparison_bench import run_site

    res = run_site(spark, site, pcts=pcts)
    for pct in pcts:
        r = res[pct]
        assert r["mae"] <= r["ref_mae_committed"] + ENVELOPE, (site, pct, r)
        # committed fills drift up to ~0.025 from the 2dp published
        # table on Madrid/Vladivostok — sanity only, not the gate
        assert abs(r["ref_mae_committed"] - r["ref_mae_published"]) < 0.03
