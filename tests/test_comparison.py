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


def test_comparison_full_sweep_json_envelope():
    """The full 24-ladder audit as ONE command + this gate: run
    `python scripts/comparison_bench.py` (optionally `--all`), which
    writes BENCH/comparison_mae.json; this test envelopes EVERY ladder
    in that artifact. Skips when the artifact is absent (the sampled
    live gates above still run) — so a stale green can't hide: the
    json carries its own per-ladder numbers and this re-checks all of
    them on every pytest run."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH",
                        "comparison_mae.json")
    if not os.path.exists(path):
        pytest.skip("BENCH/comparison_mae.json not generated")
    with open(path) as f:
        data = json.load(f)
    assert set(data) == {"StPetersburg", "Madrid", "Vladivostok"}
    n = 0
    for site, ladders in data.items():
        for pct, r in ladders.items():
            if pct.startswith("_"):
                continue
            assert r["mae"] <= r["ref_mae_committed"] + ENVELOPE, \
                (site, pct, r)
            n += 1
    assert n == 24, f"expected 24 ladders in the sweep artifact, got {n}"
