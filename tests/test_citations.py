"""Citation lint (r06 VERDICT item 6): every ``path/to/file.py:NNN``
citation in ADVICE.md / PLANS.md must point at a file that still
exists — a stale citation (e.g. the pre-split ``queries.py:27718``)
sends a judge or driver chasing ghosts. Line numbers are NOT checked
(they legitimately drift as code moves); existence is the invariant."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

_CITATION = re.compile(
    r"(?<![\w/])([A-Za-z_][A-Za-z0-9_./-]*\.(?:py|md|yml|yaml|json|toml|sql)):\d"
)


def _resolves(rel: str) -> bool:
    if (REPO / rel).is_file():
        return True
    # docs legitimately cite the reference repo for parity claims
    return REFERENCE.is_dir() and (REFERENCE / rel).is_file()


@pytest.mark.parametrize("doc", ["ADVICE.md", "PLANS.md"])
def test_cited_files_exist(doc):
    path = REPO / doc
    if not path.is_file():
        pytest.skip(f"{doc} not present")
    cited = {m.group(1) for m in _CITATION.finditer(path.read_text())}
    stale = sorted(rel for rel in cited if not _resolves(rel))
    assert not stale, f"{doc} cites files that no longer exist: {stale}"
