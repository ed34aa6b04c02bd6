"""CLI surface: `list` must enumerate the registry without starting a
JVM (it's the discovery entry point); bad query names fail loudly."""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.__main__ import main


def test_list_all(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_sector_calculated_price" in out
    assert "q110_pagerank" in out
    assert "[headline, oracle]" in out  # tags rendered


def test_list_pattern_filters(capsys):
    assert main(["list", "pagerank"]) == 0
    out = capsys.readouterr().out
    assert "q110_pagerank" in out and "q01_" not in out


def test_unknown_query_exits():
    with pytest.raises(SystemExit):
        main(["explain", "q999_nope"])
