"""Gate-history-aware ordering of the driver-facing registry.

The driver's per-round CORRECTNESS artifact caps at ~50 entries, so the
ordering of ``queries()`` decides what gets externally verified each
round. Round 3 shipped an oracle edit that hid behind a prior-round
green row (VERDICT r3 #1) because the hand-maintained head tiers only
listed *new* work, not *changed* work. This module makes staleness
mechanically visible and the ordering derived, not hand-curated:

- ``GATES.json`` (repo root) records, per entry, the last round it was
  driver-gated green and the git sha of the code state that gate ran
  against (the end-of-round snapshot commit). ``scripts/update_gates.py``
  rebuilds it from the CORRECTNESS_r*.json artifacts.
- ``gate_order()`` puts FIRST every entry that is (a) never gated green,
  or (b) implemented by any package module that changed since the sha of
  its last green gate — computed from ``git diff --name-only`` plus a
  transitive intra-package import closure of each entry's registry
  module. The already-proven tail keeps registration order.

Everything degrades gracefully: no GATES.json, no git, or an unknown
sha just means "treat as changed", which only ever *promotes* entries
into the verified head.
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
from collections.abc import Callable
from functools import lru_cache
from pathlib import Path

_PKG = "milan_telecom_etl__spark"
_PKG_DIR = Path(__file__).resolve().parent
_REPO_ROOT = _PKG_DIR.parent
_GATES_PATH = _REPO_ROOT / "GATES.json"

_IMPORT_RE = re.compile(
    r"^\s*(?:from\s+(\.{1,2}[\w.]*|milan_telecom_etl__spark[\w.]*)\s+import"
    r"|import\s+(milan_telecom_etl__spark[\w.]*))",
    re.M,
)


def _module_file(dotted: str) -> Path | None:
    """Map a package-relative dotted module to its source file."""
    rel = dotted.replace(".", "/")
    for cand in (_PKG_DIR / f"{rel}.py", _PKG_DIR / rel / "__init__.py"):
        if cand.is_file():
            return cand
    return None


def _is_package(dotted: str) -> bool:
    return (_PKG_DIR / dotted.replace(".", "/") / "__init__.py").is_file()


def _resolve_import(current: str, spec: str) -> str | None:
    """Resolve an import spec found in module `current` (package-relative
    dotted name, '' = package root) to a package-relative dotted name."""
    if spec.startswith(_PKG):
        rest = spec[len(_PKG) :].lstrip(".")
        return rest or None
    if not spec.startswith("."):
        return None
    # relative: count leading dots; one dot = current module's package
    dots = len(spec) - len(spec.lstrip("."))
    tail = spec[dots:]
    base = current if _is_package(current) else (
        current.rsplit(".", 1)[0] if "." in current else ""
    )
    for _ in range(dots - 1):
        base = base.rsplit(".", 1)[0] if "." in base else ""
    if tail:
        return f"{base}.{tail}" if base else tail
    return base or None


@lru_cache(maxsize=None)
def _deps_of(dotted: str) -> frozenset[str]:
    """Transitive intra-package import closure of one module, as a set of
    repo-relative file paths (strings, POSIX separators)."""
    seen: set[str] = set()
    files: set[str] = set()
    stack = [dotted]
    while stack:
        mod = stack.pop()
        if mod in seen:
            continue
        seen.add(mod)
        f = _module_file(mod)
        if f is None:
            continue
        files.add(f.relative_to(_REPO_ROOT).as_posix())
        src = f.read_text(errors="replace")
        for m in _IMPORT_RE.finditer(src):
            spec = m.group(1) or m.group(2)
            resolved = _resolve_import(mod, spec)
            if resolved:
                stack.append(resolved)
                # `from .operators.x import y` — y may itself be a module
                # only for `import pkg.sub` forms; the regex already gives
                # the full module path for those.
    return frozenset(files)


def entry_dep_files(fn: Callable) -> frozenset[str]:
    """Repo-relative source files an entry's implementation (transitively)
    lives in, derived from its registry module's import graph."""
    mod = getattr(fn, "__module__", "") or ""
    if mod == _PKG:
        dotted = ""
    elif mod.startswith(_PKG + "."):
        dotted = mod[len(_PKG) + 1 :]
    else:
        return frozenset()
    deps = set(_deps_of(dotted) if dotted else [])
    # the registry plumbing itself counts: an oracle edit lands there
    deps |= _deps_of("queries_registry")
    return frozenset(deps)


def load_gates() -> dict[str, dict]:
    if not _GATES_PATH.is_file():
        return {}
    try:
        data = json.loads(_GATES_PATH.read_text())
        return data.get("entries", {}) if isinstance(data, dict) else {}
    except (json.JSONDecodeError, OSError):
        return {}


@lru_cache(maxsize=None)
def _changed_since(sha: str) -> frozenset[str] | None:
    """Repo-relative paths changed between `sha` and the working tree
    (committed + uncommitted). None if git can't answer (unknown sha)."""
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", sha, "--"],
            cwd=_REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    return frozenset(p.strip() for p in out.stdout.splitlines() if p.strip())


def _latest_round_sha() -> str | None:
    if not _GATES_PATH.is_file():
        return None
    try:
        rounds = json.loads(_GATES_PATH.read_text()).get("rounds", {})
    except (json.JSONDecodeError, OSError):
        return None
    if not rounds:
        return None
    return rounds[str(max(int(k) for k in rounds))]


class _ModuleAnalysis:
    """Static per-module symbol table at one revision: top-level
    definition sources (functions, classes, constants), the names each
    definition references (bare names + one-level `alias.attr`
    attribute roots), and the import aliases needed to resolve those
    references across package modules."""

    __slots__ = ("sources", "refs", "mod_aliases", "direct_imports", "local_imports")

    def __init__(self) -> None:
        self.sources: dict[str, str] = {}
        self.refs: dict[str, set[tuple[str | None, str]]] = {}
        self.mod_aliases: dict[str, str] = {}  # alias -> dotted module
        self.direct_imports: dict[str, tuple[str, str]] = {}  # name -> (mod, name)
        # per-definition overlays for imports INSIDE function bodies
        # (`from .bucketed import appendable_bucketed_table` at the top
        # of an entry fn — the dominant lazy-import idiom here; without
        # these the closure walk would drop exactly the helper the
        # entry exists to exercise, r14 review finding #1):
        # def name -> (mod_aliases, direct_imports)
        self.local_imports: dict[
            str, tuple[dict[str, str], dict[str, tuple[str, str]]]
        ] = {}


def _read_at(sha: str | None, relpath: str) -> str | None:
    try:
        if sha is None:
            return (_REPO_ROOT / relpath).read_text(errors="replace")
        out = subprocess.run(
            ["git", "show", f"{sha}:{relpath}"],
            cwd=_REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=30,
        )
        return out.stdout if out.returncode == 0 else None
    except (OSError, subprocess.TimeoutExpired):
        return None


def _collect_refs(node: ast.AST) -> set[tuple[str | None, str]]:
    refs: set[tuple[str | None, str]] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
            refs.add((sub.value.id, sub.attr))
        elif isinstance(sub, ast.Name):
            refs.add((None, sub.id))
    return refs


@lru_cache(maxsize=None)
def _module_analysis(sha: str | None, dotted: str) -> _ModuleAnalysis | None:
    """Analyze one package module at one revision. None if the module
    file is unavailable/unparseable at that revision."""
    rel = dotted.replace(".", "/") if dotted else ""
    text = None
    for cand in (f"{_PKG}/{rel}.py", f"{_PKG}/{rel}/__init__.py"):
        text = _read_at(sha, cand)
        if text is not None:
            break
    if text is None:
        return None
    try:
        tree = ast.parse(text)
    except (SyntaxError, ValueError):
        return None

    def register_imports(
        node: ast.Import | ast.ImportFrom,
        mod_aliases: dict[str, str],
        direct_imports: dict[str, tuple[str, str]],
    ) -> None:
        if isinstance(node, ast.ImportFrom):
            spec = "." * node.level + (node.module or "")
            base = _resolve_import(dotted, spec) if spec else None
            if base is None and node.level == 0 and (node.module or "").startswith(_PKG):
                base = _resolve_import(dotted, node.module)
            for alias in node.names:
                name = alias.asname or alias.name
                if base is None:
                    continue
                child = f"{base}.{alias.name}" if base else alias.name
                if _module_file(child) is not None:
                    mod_aliases[name] = child
                else:
                    direct_imports[name] = (base, alias.name)
        else:
            for alias in node.names:
                if alias.name.startswith(_PKG):
                    name = alias.asname or alias.name.split(".")[-1]
                    target = alias.name[len(_PKG) + 1 :]
                    if _module_file(target) is not None:
                        mod_aliases[name] = target

    an = _ModuleAnalysis()
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            register_imports(node, an.mod_aliases, an.direct_imports)
            continue
        names: list[str] = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        if not names:
            continue
        src = ast.unparse(node)
        refs = _collect_refs(node)
        # imports INSIDE the definition body resolve its refs too
        local_mod: dict[str, str] = {}
        local_direct: dict[str, tuple[str, str]] = {}
        for sub in ast.walk(node):
            if isinstance(sub, (ast.Import, ast.ImportFrom)):
                register_imports(sub, local_mod, local_direct)
        for n in names:
            an.sources[n] = src
            an.refs[n] = refs
            if local_mod or local_direct:
                an.local_imports[n] = (local_mod, local_direct)
    return an


def _closure_sources(
    sha: str | None,
    dotted: str,
    name: str,
    universal_modules: frozenset[str],
) -> frozenset[tuple[str, str, str]] | None:
    """(module, name, source) for `name` in `dotted` plus every
    package-level definition it transitively references — the static
    call/constant graph an entry's behavior actually lives in.
    Definitions in universal modules (imported by EVERY entry) are
    excluded: they cannot discriminate entries, and a behavior-
    preserving refactor there would otherwise mark all 250+ entries
    changed at once. None when the ROOT module is unavailable."""
    root = _module_analysis(sha, dotted)
    if root is None or name not in root.sources:
        return None
    out: set[tuple[str, str, str]] = set()
    seen: set[tuple[str, str]] = set()
    stack: list[tuple[str, str]] = [(dotted, name)]
    while stack:
        mod, sym = stack.pop()
        if (mod, sym) in seen:
            continue
        seen.add((mod, sym))
        an = _module_analysis(sha, mod)
        if an is None:
            continue
        if sym not in an.sources:
            tgt = an.direct_imports.get(sym)
            if tgt:
                stack.append(tgt)
            continue
        if mod not in universal_modules:
            out.add((mod, sym, an.sources[sym]))
        local_mod, local_direct = an.local_imports.get(sym, ({}, {}))
        for alias, attr in an.refs.get(sym, ()):
            if alias is None:
                if attr == sym:
                    continue
                if attr in local_direct:  # in-body `from .x import y`
                    stack.append(local_direct[attr])
                elif attr in an.sources or attr in an.direct_imports:
                    stack.append((mod, attr))
            else:
                target_mod = local_mod.get(alias) or an.mod_aliases.get(alias)
                if target_mod is not None:
                    stack.append((target_mod, attr))
    return frozenset(out)


def _file_to_dotted(relpath: str) -> str:
    """'milan_telecom_etl__spark/sources/parquet.py' -> 'sources.parquet'."""
    inner = relpath[len(_PKG) + 1 :]
    if inner.endswith("/__init__.py"):
        inner = inner[: -len("/__init__.py")]
    elif inner.endswith(".py"):
        inner = inner[:-3]
    return inner.replace("/", ".")


def fn_changed_since(
    fn: Callable, sha: str, universal_modules: frozenset[str] = frozenset()
) -> bool | None:
    """Did this entry's BEHAVIOR-bearing source change between `sha`
    and the working tree? The fingerprint is the entry's decorated
    function (including the ``@register(..., oracle=...)`` decorator,
    hence the oracle SQL) PLUS every package-level function/class/
    constant it transitively references through the static reference
    graph — so a rewrite of a helper the entry serves through
    (``_s_curve_plan``, an operator in ``operators/dedup.py``) counts,
    while edits to sibling entries in the same 60-entry registry
    module do not. Definitions in `universal_modules` (imported by
    every entry — the register hub, load_table) are excluded: they
    cannot discriminate, and a behavior-preserving refactor there
    must not mark the whole registry changed (VERDICT r13 #1's
    collapse, one level down). None = undecidable (renamed file,
    unreadable revision) — callers fall back to module-closure
    staleness."""
    mod = getattr(fn, "__module__", "") or ""
    if mod == _PKG:
        dotted = ""
    elif mod.startswith(_PKG + "."):
        dotted = mod[len(_PKG) + 1 :]
    else:
        return None
    name = getattr(fn, "__name__", "")
    cur = _closure_sources(None, dotted, name, universal_modules)
    if cur is None:
        return None
    old_root = _module_analysis(sha, dotted)
    if old_root is None:
        return None
    if name not in old_root.sources:
        return True  # entry didn't exist at the gate sha
    old = _closure_sources(sha, dotted, name, universal_modules)
    if old is None:
        return None
    return cur != old


_GATE_ORDER_MEMO: dict[tuple[str, ...], list[str]] = {}


def universal_dep_files(queries_map: dict[str, Callable]) -> frozenset[str]:
    """Files in EVERY entry's dep closure (the ``register()`` hub and
    whatever it drags in). An edit to one of these marks all entries
    stale at once, so it carries zero information about WHICH entry's
    behavior changed — it must never count as a *direct* change signal
    (VERDICT r13 #1: a taxonomy edit in queries_registry.py collapsed
    gate_order to oldest-gate-first and the round's behavior-changed
    entries missed the driver's ~50-entry gate)."""
    dep_sets = [entry_dep_files(fn) for fn in queries_map.values()]
    return frozenset.intersection(*dep_sets) if dep_sets else frozenset()


def gate_order(queries_map: dict[str, Callable]) -> list[str]:
    """Order registry entry names: never-gated first, then gated-but-
    changed-since-gate, then the proven tail in registration order.

    The driver artifact caps at ~50 entries, so the stale tier is itself
    prioritized by HOW the entry went stale (VERDICT r13 #1): the
    finest signal first, because coarse signals cannot distinguish
    entries (a registry module hosts 60+ of them; the universal hub
    hosts all 250).

      tier 0: the entry's reference closure — its OWN decorated
              function source (incl. its oracle SQL in the decorator)
              PLUS the transitively referenced package helpers /
              classes / constants, minus universal modules — differs
              from its gate-sha version: a behavior edit (direct or in
              a helper the entry leans on) was never re-gated;
      tier 1: own (non-universal) module-closure deps changed since its
              gate but the fn source is unchanged/undecidable — a
              helper it may depend on moved (also: gate sha unknown to
              git, treated conservatively);
      tier 2: only universal-closure files changed since the latest
              round snapshot (registry metadata edits this round);
      tier 3: only universal-closure files changed since its gate.

    Within a tier, oldest-gate-first so coverage rotates rather than
    starves. Entries implemented IN the universal hub itself (the core
    queries_registry entries) still get tier 0 via their fn fingerprint;
    their module tier collapses to 2/3 by construction.
    """
    # memoized per registry composition: __spark_entry__ calls this
    # from both queries() and oracle_sql() every harness startup, and
    # the closure-fingerprint pass shells out to git per (sha, module).
    # Same staleness window as the lru caches below: working-tree
    # edits made mid-process are not re-observed.
    key = tuple(queries_map)
    cached = _GATE_ORDER_MEMO.get(key)
    if cached is not None:
        return list(cached)
    never, stale, tail, _evidence = classify_gates(queries_map)
    result = never + [name for _, _, name in stale] + tail
    _GATE_ORDER_MEMO[key] = result
    return list(result)


def classify_gates(
    queries_map: dict[str, Callable],
) -> tuple[list[str], list[tuple[int, int, str]], list[str], dict[str, frozenset[str]]]:
    """The gate_order classification, with evidence: returns
    (never, stale, tail, changed_files) where `stale` is sorted
    (tier, gate-round, name) triples and `changed_files[name]` is the
    set of closure files that moved since the entry's gate — the
    attribution input for the hub-collapse tripwire."""
    gates = load_gates()
    latest = _latest_round_sha()
    fresh_changed = _changed_since(latest) if latest else None
    universal = universal_dep_files(queries_map)
    universal_mods = frozenset(_file_to_dotted(p) for p in universal)
    never: list[str] = []
    stale: list[tuple[int, int, str]] = []  # (tier, gate-round, name)
    tail: list[str] = []
    evidence: dict[str, frozenset[str]] = {}
    for name, fn in queries_map.items():
        rec = gates.get(name)
        if not rec or not rec.get("sha"):
            never.append(name)
            continue
        changed = _changed_since(rec["sha"])
        deps = entry_dep_files(fn)
        if changed is not None and not (deps & changed):
            tail.append(name)
            continue
        own = deps - universal
        direct = fn_changed_since(fn, rec["sha"], universal_mods)
        if direct is True:
            tier = 0
        elif changed is None or (own & changed):
            tier = 1
        elif fresh_changed and (deps & fresh_changed):
            tier = 2
        else:
            tier = 3
        stale.append((tier, rec.get("round", 0), name))
        evidence[name] = frozenset(deps & changed) if changed is not None else deps
    stale.sort(key=lambda t: (t[0], t[1]))
    return never, stale, tail, evidence


# A gate-order head is only informative while TIER 0 — the closure
# fingerprint's "this entry's behavior changed" signal — stays small
# relative to the driver's ~50-entry cap; when one edit marks near
# half the registry tier 0, the order inside the tier degenerates to
# oldest-gate-first and the entries whose behavior actually changed
# can miss the gate (the r13 collapse, one level down). Tier 1 is the
# normal rotation backlog (near-universal loader/hub files touched in
# prior rounds keep entries module-stale until their turn through the
# 50-entry gate — 176/250 at the r15 HEAD) and is NOT the alarm
# signal. 0.4 is well above any honest round's tier-0 footprint
# (largest to date: r14's closure-change set, 34-40/252 = 13-16%).
HUB_COLLAPSE_FRACTION = 0.4


def hub_collapse_report(
    classification: tuple[
        list[str], list[tuple[int, int, str]], list[str], dict[str, frozenset[str]]
    ],
) -> dict:
    """Tripwire input (VERDICT r14 #7): the universal-module exclusion
    is COMPUTED as the intersection of every entry's dep closure, so a
    module imported by *almost* every entry (a behavior-bearing hub one
    import short of universal) is excluded from nothing — an edit to it
    floods tier 0 and silently re-creates the r13 collapse. When the
    tier-0 fraction of gated entries exceeds HUB_COLLAPSE_FRACTION,
    name the file(s) whose change appears in that flood's closures so
    tests/test_gating.py can demand they be justified (moved out of
    entry closures, or explicitly allow-listed with a reason)."""
    from collections import Counter

    never, stale, tail, evidence = classification
    gated = len(stale) + len(tail)
    hot = [name for tier, _, name in stale if tier == 0]
    frac = len(hot) / gated if gated else 0.0
    counts: Counter[str] = Counter(
        f for name in hot for f in evidence.get(name, ())
    )
    threshold = max(1, int(HUB_COLLAPSE_FRACTION * gated))
    return {
        "fraction_tier0": round(frac, 3),
        "n_gated": gated,
        "n_tier0": len(hot),
        "collapsed": frac > HUB_COLLAPSE_FRACTION,
        "culprit_files": sorted(
            f for f, c in counts.items() if c >= threshold
        ),
        "file_counts": dict(counts.most_common(10)),
    }
