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


# Commit-hash lint (r07 VERDICT item 6): COVERAGE.md cited a superseded
# attestation commit (ed5840b, re-stamped to 74f2829) and the file:line
# lint above couldn't see it. A hash citation must resolve to a commit
# that exists in THIS repo. The token must contain both a hex letter
# and a digit — that excludes decimal constants (2147483647) and the
# rare all-letter English hex words ("defaced") while matching every
# realistic abbreviated commit id.
_HASHISH = re.compile(
    r"\b(?=[0-9a-f]*[a-f])(?=[0-9a-f]*[0-9])([0-9a-f]{7,40})\b"
)


@pytest.mark.parametrize("doc", ["COVERAGE.md", "SCALE.md", "PLANS.md", "ADVICE.md"])
def test_cited_commits_exist(doc):
    import subprocess

    path = REPO / doc
    if not path.is_file():
        pytest.skip(f"{doc} not present")
    cited = {m.group(1) for m in _HASHISH.finditer(path.read_text())}
    stale = sorted(
        h
        for h in cited
        if subprocess.run(
            ["git", "cat-file", "-e", f"{h}^{{commit}}"],
            cwd=REPO,
            capture_output=True,
        ).returncode
        != 0
    )
    assert not stale, f"{doc} cites commits that do not exist in this repo: {stale}"
