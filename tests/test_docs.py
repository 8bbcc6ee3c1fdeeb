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


def test_taxonomy_is_total_and_known():
    # every entry resolves to exactly one known category; override
    # names must exist in the registry (a rename would otherwise leave
    # a ghost override behind)
    sys.path.insert(0, REPO)
    import __spark_entry__  # noqa: F401  (fills the registry)
    from milan_telecom_etl__spark.queries_registry import QUERIES
    from milan_telecom_etl__spark.taxonomy import (
        CATEGORY_OVERRIDES,
        MODULE_CATEGORY,
        categories,
    )

    cats = categories()  # raises KeyError if any entry is unmapped
    assert set(cats) == set(QUERIES)
    known = set(MODULE_CATEGORY.values()) | {
        "llm-dedup", "eval", "serving", "multimodal"
    }
    assert set(cats.values()) <= known
    ghosts = set(CATEGORY_OVERRIDES) - set(QUERIES)
    assert not ghosts, f"overrides for unregistered entries: {sorted(ghosts)}"
