"""OPERATORS.md freshness pin — the index regenerates from the live
registry, so an entry added without re-running the generator fails
here (the budgets-file bookkeeping discipline, applied to docs)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operators_md_is_fresh():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import gen_operators_md

    with open(os.path.join(REPO, "OPERATORS.md")) as f:
        assert f.read() == gen_operators_md.render(), (
            "OPERATORS.md is stale — run scripts/gen_operators_md.py"
        )
