"""Per-family bench budget tripwire (VERDICT r6 #8, load-immunity r10).

Round 6's shared-persist refactors taxed ~20 text-family entries at
sf0.1 and nothing tripped until the judge diffed the round sidecars.
This test reads the committed `BENCH_DETAIL.json` (sha+UTC-stamped by
bench.py, refreshed every round at sf0.1) and asserts each registry
family stays under a pinned ceiling.

LOAD-IMMUNITY PROTOCOL (r10, closes VERDICT r9 #1). The r9 round
exposed that family MEANS have no immunity to machine load: between
two same-code sweeps (`BENCH_DETAIL_r09.json` builder-run vs
`BENCH_DETAIL_r10.json` driver judge-time run) 12 entries swung >2x
(one 5.6x) on pure environment, tripping 4 family-mean budgets while
the run-level MEDIAN ratio across 229 common entries was 1.008.
Load noise is tail-shaped — a few entries at a time stall on CPU
contention — so:

- The family statistic is the MEDIAN wall, not the mean. A
  family-wide regression (the r6 incident class: every entry in the
  family taxed by a shared-module change) shifts the median exactly
  as much as the mean, so detection power for the incident this
  tripwire exists for is unchanged; tail-entry noise no longer trips.
  Measured across the two committed same-code artifacts, every family
  median moved <=11% while four family means moved 14-56%.
- Ceilings are ~1.4x the WORSE of the two committed same-code runs'
  medians (r09 builder + r10 driver), so the test is green against
  both by construction, with the same relative headroom the mean
  budgets had.
- A catastrophic per-entry absolute ceiling (12 s at sf0.1, ~2x the
  worst under-load wall ever observed, >3x the worst steady wall)
  backstops single-entry blowups that a median cannot see.
- Any per-entry delta <2x observed in a full sweep is NOISE until
  reproduced in an isolation run (PLANS.md r9 protocol) — do not
  re-pin budgets off a single loaded sweep.

Families = registry module of each entry (`QUERIES[name].__module__`),
so new entries are automatically budgeted with their family. A new
family (new module) is not budgeted until a ceiling is added here —
test fails to force that bookkeeping.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "BENCH_DETAIL.json")

# SWEEP-MEDIAN DEFLATION (VERDICT r13 #2, mechanizing the PLANS.md
# "1.36x machine day" protocol). The on-disk BENCH_DETAIL.json may be
# a sweep taken on a loaded/slow machine (the driver overwrites it at
# judge time); the per-entry ratio MEDIAN against the last COMMITTED
# sweep is the environment factor — a whole-machine slowdown moves
# every entry, while a genuine regression moves only the entries whose
# code changed. Family medians are compared AFTER dividing by that
# factor, so a uniformly-inflated sweep stays green and a family-wide
# code regression (which barely moves the 250-entry sweep median)
# still trips. The factor is clamped to [1, 2]: never inflate values
# on a fast machine, and never silently absorb more than a 2x
# environment claim (a >2x "machine day" needs the human isolation
# protocol, not an automatic pass).

_MIN_COMMON = 20  # below this the ratio median is noise; don't deflate
_MAX_FACTOR = 2.0


def environment_factor(
    queries: dict[str, float], reference: dict[str, float] | None
) -> float:
    if not reference:
        return 1.0
    ratios = [
        t / reference[name]
        for name, t in queries.items()
        if t > 0 and reference.get(name, 0) > 0
    ]
    if len(ratios) < _MIN_COMMON:
        return 1.0
    return max(1.0, min(statistics.median(ratios), _MAX_FACTOR))


def _committed_reference() -> dict[str, float] | None:
    """queries map of the committed BENCH_REFERENCE.json — the
    builder-pinned STEADY sweep. Deliberately NOT BENCH_DETAIL.json:
    the driver overwrites (and its round commit re-commits) that file
    with whatever the judge-time machine produced, so it can't anchor
    an environment comparison (the r13 contaminated sweep was itself
    the committed artifact). BENCH_REFERENCE.json is only ever written
    by the builder on an idle machine. Read via `git show HEAD:` so a
    working-tree overwrite can't move the anchor either."""
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_REFERENCE.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
        if out.returncode != 0:
            return None
        data = json.loads(out.stdout)
        if str(data.get("sf")) != "0.1":
            return None
        return {k: v for k, v in data["queries"].items() if v > 0}
    except Exception:
        return None

# Ceiling on the family's MEDIAN seconds/query at sf0.1 (local[32]).
# ~1.4x the worse of the two committed same-code r9 sweeps (builder
# r09 + driver r10) — loose enough for measured cross-run drift
# (<=11% on medians), tight enough that a 2x family-wide regression
# (the r6 incident size) trips. Re-baseline deliberately when a family
# legitimately changes shape, in the same commit, with the reason in
# the message.
FAMILY_MEDIAN_BUDGET_S = {
    "queries_registry": 0.38,  # worse-run median 0.265 s, n=12
    "registry_analytics": 0.46,  # 0.323 s, n=25
    "registry_geo": 0.37,  # 0.261 s, n=3
    "registry_ml": 0.73,  # 0.519 s, n=10
    "registry_quality": 0.73,  # 0.519 s, n=24
    "registry_sampling": 0.41,  # 0.288 s, n=11
    "registry_semistructured": 0.27,  # 0.186 s, n=7
    "registry_series": 0.55,  # 0.393 s, n=10
    "registry_similarity": 1.33,  # 0.950 s, n=27
    "registry_streaming": 1.96,  # 1.397 s, n=9
    "registry_temporal": 0.31,  # 0.221 s, n=11
    "registry_text": 1.07,  # 0.762 s, n=54
    "registry_tpch": 0.87,  # 0.620 s, n=23
}

# No single registry entry may exceed this wall at sf0.1, ever. The
# worst honest steady-state entry is ~4 s (curation_funnel /
# bpe_encode_vocab); the worst under-load observation across committed
# sidecars is 5.4 s. 12 s therefore only fires on a genuine
# order-of-magnitude blowup (accidental cartesian, lost broadcast,
# driver-side loop), which a family median cannot see.
ENTRY_CATASTROPHIC_S = 12.0


def _load_detail() -> dict:
    with open(ARTIFACT) as f:
        detail = json.load(f)
    if str(detail.get("sf")) != "0.1":
        pytest.skip(f"BENCH_DETAIL.json is at sf={detail.get('sf')}, budgets are sf0.1")
    return detail


def _families(
    queries: dict[str, float] | None = None,
) -> dict[str, list[tuple[str, float]]]:
    if queries is None:
        queries = _load_detail()["queries"]
    import __spark_entry__  # noqa: F401  (registration side effects)

    from milan_telecom_etl__spark.queries_registry import QUERIES

    fams: dict[str, list[tuple[str, float]]] = {}
    for name, t in queries.items():
        if t < 0 or name not in QUERIES:
            continue
        fam = QUERIES[name].__module__.rsplit(".", 1)[-1]
        fams.setdefault(fam, []).append((name, t))
    return fams


# Per-ENTRY pins for the flagship queries (VERDICT r7 #5): family
# statistics average away drift on individual headline entries
# (top_cells slid 0.26 -> 0.43 s across r6->r8 unnoticed). Root-caused
# r8: an 8-rep isolated run converges to 0.40-0.50 s — 0.43 IS the
# steady state and the r06 0.26 was the outlier. Ceilings ~2x the
# honest steady wall — the flagship should never be a multi-second
# query at sf0.1. top_cells was also the stable sentinel across the
# r9/r10 same-code pair (0.337 -> 0.273 s, <20% drift).
ENTRY_BUDGET_S = {
    "top_cells": 0.7,   # r9 steady 0.26-0.34 s; isolated steady 0.50 s
    # (r8 8-rep convergence band 0.40-0.50 unchanged, re-probed r14).
    # Re-pinned 0.6 -> 0.7 in r14: bench.py now sweeps in REGISTRATION
    # order (VERDICT r13 #3), which permanently parks top_cells at
    # sweep position 1 where it absorbs the early-sweep JIT ramp the
    # gate-order heads used to absorb (r14 steady sweep read 0.61 in
    # position 1 vs 0.50 isolated on the same idle machine). The pin
    # still fires at ~1.4x the in-sweep steady state.
    "top_cells_sql": 0.6,  # r9 steady 0.23 s — front-door overhead was
    # per-call re-registration of 10 temp views (footer re-reads), now
    # memoized per (session, sf_dir); see sources/parquet.py
}


def test_flagship_entries_within_budget():
    detail = _load_detail()
    over = [
        f"{name}: {detail['queries'][name]:.3f}s > {budget}s"
        for name, budget in ENTRY_BUDGET_S.items()
        if name in detail["queries"] and detail["queries"][name] > budget
    ]
    assert not over, "flagship entry budgets exceeded:\n" + "\n".join(over)


def test_every_family_is_budgeted():
    missing = set(_families()) - set(FAMILY_MEDIAN_BUDGET_S)
    assert not missing, (
        f"families without a bench budget: {sorted(missing)} — add a ceiling "
        "to FAMILY_MEDIAN_BUDGET_S"
    )


def _family_budget_violations(
    queries: dict[str, float], reference: dict[str, float] | None
) -> list[str]:
    factor = environment_factor(queries, reference)
    over = []
    for fam, entries in _families(queries).items():
        budget = FAMILY_MEDIAN_BUDGET_S.get(fam)
        if budget is None:
            continue  # test_every_family_is_budgeted reports it
        med = statistics.median(t for _, t in entries) / factor
        if med > budget:
            worst = sorted(entries, key=lambda kv: -kv[1])[:3]
            over.append(
                f"{fam}: deflated median {med:.3f}s > {budget}s "
                f"(env factor {factor:.3f}, worst {worst})"
            )
    return over


def test_family_medians_within_budget():
    over = _family_budget_violations(
        _load_detail()["queries"], _committed_reference()
    )
    assert not over, (
        "family bench MEDIAN budgets exceeded (load-immune statistic, "
        "environment-deflated vs the committed sweep — a trip means at "
        "least half the family regressed beyond the whole-sweep shift; "
        "reproduce in isolation per PLANS.md before re-pinning):\n"
        + "\n".join(over)
    )


# --- synthetic fixtures for the deflation mechanism (VERDICT r13 #2) --


def _synthetic_reference() -> dict[str, float]:
    """A steady sweep: every registered entry at a value 25% under its
    family budget (so the synthetic cases exercise ONLY the deflation
    arithmetic, not the committed artifact)."""
    import __spark_entry__  # noqa: F401

    from milan_telecom_etl__spark.queries_registry import QUERIES

    ref = {}
    for name, fn in QUERIES.items():
        fam = fn.__module__.rsplit(".", 1)[-1]
        budget = FAMILY_MEDIAN_BUDGET_S.get(fam)
        if budget:
            ref[name] = budget * 0.75
    return ref


def test_uniformly_inflated_sweep_stays_green():
    ref = _synthetic_reference()
    loaded = {k: v * 1.5 for k, v in ref.items()}  # 1.5x machine day
    assert environment_factor(loaded, ref) == pytest.approx(1.5)
    assert _family_budget_violations(loaded, ref) == []


def test_spot_contaminated_sweep_stays_green():
    # the r13 judge-sweep shape: a ~10% cluster of entries spiked 4-15x
    # on a machine running ~1.14x slow; family medians must survive
    ref = _synthetic_reference()
    loaded = {k: v * 1.14 for k, v in ref.items()}
    names = sorted(loaded)
    for name in names[:: max(1, len(names) // 20)]:  # ~5% spread spikes
        loaded[name] *= 6.0
    assert _family_budget_violations(loaded, ref) == []


def test_genuine_family_regression_still_trips():
    import __spark_entry__  # noqa: F401

    from milan_telecom_etl__spark.queries_registry import QUERIES

    ref = _synthetic_reference()
    loaded = dict(ref)
    for name in loaded:
        if QUERIES[name].__module__.endswith("registry_quality"):
            loaded[name] *= 2.0  # the r6 incident class
    over = _family_budget_violations(loaded, ref)
    assert any(v.startswith("registry_quality") for v in over), over
    # and ONLY that family trips
    assert all(v.startswith("registry_quality") for v in over), over


def test_environment_factor_clamps():
    ref = _synthetic_reference()
    # >2x whole-sweep shift is not silently absorbed
    crazy = {k: v * 3.0 for k, v in ref.items()}
    assert environment_factor(crazy, ref) == _MAX_FACTOR
    # fast machines never get inflated into the budgets
    fast = {k: v * 0.5 for k, v in ref.items()}
    assert environment_factor(fast, ref) == 1.0
    # too few common entries -> no deflation claim
    assert environment_factor(dict(list(ref.items())[:5]), ref) == 1.0


def test_no_entry_catastrophic():
    detail = _load_detail()
    over = [
        f"{name}: {t:.2f}s > {ENTRY_CATASTROPHIC_S}s"
        for name, t in detail["queries"].items()
        if t > ENTRY_CATASTROPHIC_S
    ]
    assert not over, (
        "catastrophic per-entry walls (order-of-magnitude blowup — lost "
        "broadcast / cartesian / driver loop?):\n" + "\n".join(over)
    )
