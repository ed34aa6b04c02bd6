"""Rotation robustness (r06 VERDICT item 7): a malformed
``CORRECTNESS_r*.json`` must degrade to "contributes no green rows" —
never crash ``queries()``, and never DE-rotate the registry (which
would silently burn a whole driver window re-verifying old queries).
Also pins the r06 ADVICE fix: a ``no_oracle`` row counts as green only
when the driver actually recorded a row count."""

from __future__ import annotations

import json

from stock_data_pipeline_spark.queries import REGISTRY
from stock_data_pipeline_spark.queries._api import _externally_verified, _rotated_names

_DECLARED = [n for n in REGISTRY if REGISTRY[n].oracle]


def test_corrupt_file_contributes_nothing(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json at all")
    assert _externally_verified(tmp_path) == set()
    # never-verified ordering intact: rotation == registry order
    assert _rotated_names(tmp_path) == _DECLARED


def test_empty_and_wrong_shape_files(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("")
    (tmp_path / "CORRECTNESS_r02.json").write_text("[]")  # valid JSON, wrong shape
    (tmp_path / "CORRECTNESS_r03.json").write_text('{"q01_flagship": "not-a-dict"}')
    assert _externally_verified(tmp_path) == set()
    assert _rotated_names(tmp_path) == _DECLARED


def test_good_rows_still_rotate_past_a_corrupt_sibling(tmp_path):
    """One corrupt artifact must not poison the others: the green query
    moves to the back, everything else keeps registry order."""
    (tmp_path / "CORRECTNESS_r01.json").write_text("\x00garbage")
    green_name = _DECLARED[0]
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({green_name: {"hash_match": True, "err": None}})
    )
    assert _externally_verified(tmp_path) == {green_name}
    rotated = _rotated_names(tmp_path)
    assert rotated[-1] == green_name
    assert rotated[:-1] == [n for n in _DECLARED if n != green_name]


def test_no_oracle_green_requires_recorded_rows(tmp_path):
    """r06 ADVICE: ``spark_rows: null`` (or absent) on a no_oracle row
    must NOT count as green — the old ``(x or 0) >= 0`` was vacuous."""
    a, b, c = _DECLARED[:3]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                a: {"err": "no_oracle", "spark_rows": None},
                b: {"err": "no_oracle"},
                c: {"err": "no_oracle", "spark_rows": 0},  # 0 rows IS a recorded run
            }
        )
    )
    assert _externally_verified(tmp_path) == {c}


def test_missing_directory_front_loads_everything(tmp_path):
    empty = tmp_path / "nothing_here"
    empty.mkdir()
    assert _rotated_names(empty) == _DECLARED


def test_live_repo_rotation_is_sane():
    """With the real committed artifacts: every declared query appears
    exactly once, and the ever-greened set is non-empty (six rounds of
    driver windows exist)."""
    rotated = _rotated_names()
    assert sorted(rotated) == sorted(_DECLARED)
    assert len(_externally_verified()) >= 200
