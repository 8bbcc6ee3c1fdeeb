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


@lru_cache(maxsize=None)
def _module_fn_sources(sha: str | None, relpath: str) -> dict[str, str] | None:
    """name -> ``ast.unparse``d module-level (decorated) function source
    in `relpath` at revision `sha` (None = working tree). Unparse
    normalizes formatting, so whitespace/comment churn doesn't read as
    a change. None when the revision/file/parse is unavailable."""
    try:
        if sha is None:
            text = (_REPO_ROOT / relpath).read_text(errors="replace")
        else:
            out = subprocess.run(
                ["git", "show", f"{sha}:{relpath}"],
                cwd=_REPO_ROOT,
                capture_output=True,
                text=True,
                timeout=30,
            )
            if out.returncode != 0:
                return None
            text = out.stdout
        tree = ast.parse(text)
    except (OSError, SyntaxError, ValueError, subprocess.TimeoutExpired):
        return None
    return {
        node.name: ast.unparse(node)
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    }


def fn_changed_since(fn: Callable, sha: str) -> bool | None:
    """Did this entry's own decorated function body (including its
    ``@register(..., oracle=...)`` decorator, hence the oracle SQL)
    change between `sha` and the working tree? None = undecidable
    (renamed file, non-module-level fn, unreadable revision) — callers
    fall back to module-closure staleness.

    This is the per-ENTRY change signal module closures can't give
    (VERDICT r13 #1): registry_text.py hosts 60+ entries, so a serving
    rewrite of two of them marks all of them module-stale; only the
    rewritten functions' sources actually differ."""
    mod = getattr(fn, "__module__", "") or ""
    if mod == _PKG:
        dotted = ""
    elif mod.startswith(_PKG + "."):
        dotted = mod[len(_PKG) + 1 :]
    else:
        return None
    f = _module_file(dotted) if dotted else None
    if f is None:
        return None
    relpath = f.relative_to(_REPO_ROOT).as_posix()
    cur = _module_fn_sources(None, relpath)
    old = _module_fn_sources(sha, relpath)
    if cur is None or old is None:
        return None
    name = getattr(fn, "__name__", "")
    if name not in cur:
        return None
    if name not in old:
        return True  # function didn't exist at the gate sha
    return cur[name] != old[name]


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

      tier 0: the entry's OWN decorated function source (incl. its
              oracle SQL in the decorator) differs from its gate-sha
              version — a direct behavior edit was never re-gated;
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
    gates = load_gates()
    latest = _latest_round_sha()
    fresh_changed = _changed_since(latest) if latest else None
    universal = universal_dep_files(queries_map)
    never: list[str] = []
    stale: list[tuple[int, int, str]] = []  # (tier, gate-round, name)
    tail: list[str] = []
    for idx, (name, fn) in enumerate(queries_map.items()):
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
        direct = fn_changed_since(fn, rec["sha"])
        if direct is True:
            tier = 0
        elif changed is None or (own & changed):
            tier = 1
        elif fresh_changed and (deps & fresh_changed):
            tier = 2
        else:
            tier = 3
        stale.append((tier, rec.get("round", 0), name))
    stale.sort(key=lambda t: (t[0], t[1]))
    return never + [name for _, _, name in stale] + tail
