"""Pins on the committed SHUFFLE_r09.json / SHUFFLE_SKEW_r09.json
artifacts (tools/shuffle_probe.py).

The scaling curve (SCALE.md §13) bounds CPU growth; these pins bound the
BYTES the headline plans move — the quantity that saturates a cluster
fabric at 100 TB. Artifact-based like the ANN recall floors: the pins
are deterministic at any checkout and fire when the artifact is
regenerated after a plan change. See SCALE.md §16.

Two regimes matter:

- the FINAL scale pair (sf1 -> sf2) is past every broadcast-to-
  shuffle-join plan transition the fixtures can trigger, so its
  exponent is the asymptotic law: it must be ~1 (linear in input) for
  every query that shuffles at all;
- EARLIER pairs may legitimately exceed 1 when a join flips from
  broadcast (no exchange) to SMJ (both sides exchanged) as a side
  crosses the broadcast threshold — q90's 0.3 -> 1.0 cliff in the r08
  first cut was exactly that, and its post-transition exponent is 1.0.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

FINAL_PAIR = "1.0->2.0"
LINEAR_CEILING = 1.25  # linear plus shuffle-log / partition-rounding slack


def _artifact(name: str = "SHUFFLE_r09.json"):
    p = Path(__file__).resolve().parent.parent / name
    if not p.exists():
        pytest.skip(f"{name} not committed at this checkout")
    return json.loads(p.read_text())


def test_no_headline_plan_spills_at_any_fixture_scale():
    """Spill at fixture scale means partition sizing is already wrong
    1000x early; every headline plan must stay in memory."""
    art = _artifact()
    spilled = {q for q, r in art.items() if r["spilled"]}
    assert not spilled, spilled


def test_shuffle_volume_is_asymptotically_linear():
    """Past the last broadcast->SMJ transition (the final scale pair),
    every plan's exchange volume must grow at most linearly with input.
    A super-linear final exponent is a fabric-saturating amplification
    (a pair-join leaking toward N^2, an unguarded fan-out) that CPU
    curves can miss when per-row work is cheap."""
    art = _artifact()
    checked = 0
    for q, r in art.items():
        beta = r["beta_shuffle_write"].get(FINAL_PAIR)
        if beta is None:  # below the 1 MiB noise floor at sf1 — no law to test
            continue
        assert beta <= LINEAR_CEILING, (q, r["beta_shuffle_write"])
        checked += 1
    assert checked >= 8, f"artifact lost coverage: only {checked} final-pair betas"


def test_scan_volume_tracks_input_where_measurable():
    """Where the scan side clears the probe's 1 MiB floor, input bytes
    must grow ~linearly too — a jump means column pruning or filter
    pushdown regressed at scale."""
    art = _artifact()
    checked = 0
    for q, r in art.items():
        for pair, beta in r["beta_input"].items():
            assert beta <= LINEAR_CEILING, (q, pair, r["beta_input"])
            checked += 1
    # coverage floor (r08 ADVICE): a regenerated artifact whose scans all
    # fell below the probe's 1 MiB floor would pass this test vacuously
    assert checked >= 8, f"artifact lost coverage: only {checked} input betas"


def test_shuffle_volume_stays_linear_under_zipf_keys():
    """r08 VERDICT item 5: the uniform byte curve bounds amplification
    and the skew probe bounds stragglers/CPU, but neither instrument
    could see a hot key RE-INFLATING an exchange past a map-side
    partial aggregate at scale — e.g. a zipf head defeating the
    aggregate-before-join rewrite's combine step. The skewed-fixture
    byte curve (bounded zipf 1.2 on l_orderkey/o_custkey/user_id + the
    hot shingle in every 3rd doc) closes that blind spot: the final
    scale pair must stay ~linear and spill-free under skew too."""
    art = _artifact("SHUFFLE_SKEW_r09.json")
    spilled = {q for q, r in art.items() if r["spilled"]}
    assert not spilled, spilled
    checked = 0
    for q, r in art.items():
        beta = r["beta_shuffle_write"].get(FINAL_PAIR)
        if beta is None:
            continue
        assert beta <= LINEAR_CEILING, (q, r["beta_shuffle_write"])
        checked += 1
    assert checked >= 8, f"skewed artifact lost coverage: only {checked} betas"
