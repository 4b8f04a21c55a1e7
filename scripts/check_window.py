"""Driver-window evasion tripwire (VERDICT r9 #9; deepened r11 per
VERDICT r10 #4).

The driver's correctness gate re-verifies only the FIRST
``DRIVER_WINDOW`` catalog entries each round; entries beyond it are
covered by ``PREVIOUSLY_DRIVER_VERIFIED`` — a hand-maintained claim
that their implementation has not changed since their last driver-green
row. This script turns that discipline into an assert: it hashes every
catalog query against the committed manifest
``scripts/query_hashes.json`` (a snapshot taken when the previous
round's window was cut) and FAILS if any changed-or-new query sits
beyond the window.

Manifest format v2 (r11): a query's hash covers
- its own function source and oracle SQL (the v1 surface),
- the source of every ``queries.py``-level helper it reaches
  (transitively through helpers — ``_co_order_edges`` and friends), and
- the source of every PACKAGE MODULE it reaches, transitively through
  the package-internal import graph (so editing ``operators/dedup.py``
  flags every dedup-consuming query, and editing ``operators/png.py``
  flags the multimodal rows that only reach it through
  ``multimodal.smart_decode``'s local import).

Dependency discovery is deliberately COARSE (module-level, source-text
import scan + code-object global-name resolution): false positives
force a redundant re-verify, false negatives would defeat the tripwire,
so over-approximation is the correct bias. A v1 (flat-dict) manifest is
still understood — it compares on the v1 surface and prints a nudge;
``--update`` always writes v2.

Usage::

    python scripts/check_window.py            # assert (CI mode)
    python scripts/check_window.py --update   # re-snapshot the manifest

``--update`` is part of cutting a round: run it AFTER arranging the
window so next round's check compares against this round's verified
state.

Evidence path (r13, ADVICE r12): when a module edit flips more query
hashes than the 50-slot window holds, the overflow is NOT silently
re-baselined — each changed query beyond the window must carry an
entry in ``scripts/local_verified.json`` whose hash equals the query's
CURRENT v2 hash, written only by a green
``scripts/check_oracle.py --record`` run. Evidence self-invalidates on
any further change; NEW queries never pass on evidence.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "query_hashes.json")
PKG = "dataflow_flex_pyarrow_to_gds_spark"
PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), PKG
)

_IMPORT_RE = re.compile(
    r"^\s*from\s+(\.{1,2})([\w.]*)\s+import\s+([^\n]+)", re.M
)
_ABS_IMPORT_RE = re.compile(
    rf"^\s*(?:from|import)\s+{PKG}\.([\w.]+)", re.M
)


def package_modules() -> dict[str, str]:
    """package-relative dotted module name -> file path (``.py`` files,
    ``__init__`` included under the subpackage name)."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG_DIR)
            parts = rel[:-3].split(os.sep)
            if parts[-1] == "__init__":
                parts = parts[:-1]
            out[".".join(parts) if parts else "__init__"] = path
    return out


def _resolve_relative(owner: str, dots: str, target: str) -> str:
    """Resolve a ``from .x`` / ``from ..y`` import found in module
    ``owner`` (package-relative dotted name) to a package-relative
    dotted name (may be '' for the package root)."""
    parent = owner.split(".")[:-1]  # owner's package
    up = len(dots) - 1
    base = parent[: len(parent) - up] if up else parent
    return ".".join(base + ([target] if target else []))


def module_imports(
    name: str, source: str, known: set[str]
) -> frozenset[str]:
    """Package-internal modules imported by ``name`` (source-text scan:
    catches module-level AND function-local imports)."""
    deps: set[str] = set()
    for m in _IMPORT_RE.finditer(source):
        dots, target, names = m.groups()
        base = _resolve_relative(name, dots, target)
        if base in known:
            deps.add(base)
        # `from . import dedup as X, text` — the imported NAMES may be
        # submodules of the resolved base package
        for n in re.split(r"[,\s()]+", names):
            n = n.strip()
            if not n or n == "as":
                continue
            cand = f"{base}.{n}" if base else n
            if cand in known:
                deps.add(cand)
    for m in _ABS_IMPORT_RE.finditer(source):
        target = m.group(1)
        while target and target not in known:
            target = ".".join(target.split(".")[:-1])
        if target:
            deps.add(target)
    deps.discard(name)
    return frozenset(deps)


def module_closures() -> tuple[dict[str, frozenset[str]], dict[str, str]]:
    """(module -> transitive package-dep closure incl. itself,
    module -> sha256 of its own source)."""
    mods = package_modules()
    known = set(mods)
    srcs = {n: open(p, encoding="utf-8").read() for n, p in mods.items()}
    direct = {n: module_imports(n, s, known) for n, s in srcs.items()}
    # Kleene fixpoint, NOT a DFS: a DFS that cuts cycles by returning a
    # partial set makes cycle members' closures depend on traversal
    # order, and set iteration order varies with PYTHONHASHSEED — the
    # manifest then flips between processes (observed r12: the same
    # tree hashed two ways). The fixpoint is order-independent by
    # construction: iterate until no closure grows.
    closure: dict[str, frozenset[str]] = {
        n: frozenset({n}) | direct[n] for n in mods
    }
    changed = True
    while changed:
        changed = False
        for n in mods:
            acc = set(closure[n])
            for d in direct[n]:
                acc |= closure[d]
            if len(acc) != len(closure[n]):
                closure[n] = frozenset(acc)
                changed = True
    hashes = {
        n: hashlib.sha256(s.encode()).hexdigest() for n, s in srcs.items()
    }
    return closure, hashes


def _used_global_names(fn) -> set[str]:
    names: set[str] = set()

    def walk(code):
        names.update(code.co_names)
        for c in code.co_consts:
            if isinstance(c, types.CodeType):
                walk(c)

    walk(fn.__code__)
    return names


def query_deps(fn, closure: dict[str, frozenset[str]]) -> tuple[
    frozenset[str], str
]:
    """(transitive package-module deps, concatenated source of reached
    ``queries.py``-level helpers) for one catalog query function."""
    import dataflow_flex_pyarrow_to_gds_spark.queries as C

    deps: set[str] = set()
    helper_srcs: list[str] = []
    seen_fns: set[str] = set()

    def visit(f) -> None:
        if f.__qualname__ in seen_fns:
            return
        seen_fns.add(f.__qualname__)
        src = inspect.getsource(f)
        # function-local package imports
        for mod in module_imports("queries", src, set(closure)):
            deps.update(closure[mod])
        # globals: helpers and imported package objects
        for name in _used_global_names(f):
            obj = C.__dict__.get(name)
            if obj is None:
                continue
            if isinstance(obj, types.ModuleType):
                modname = getattr(obj, "__name__", "")
                if modname.startswith(PKG + "."):
                    rel = modname[len(PKG) + 1:]
                    deps.update(closure.get(rel, frozenset({rel})))
            elif isinstance(obj, types.FunctionType):
                omod = getattr(obj, "__module__", "")
                if omod == C.__name__:
                    helper_srcs.append(inspect.getsource(obj))
                    visit(obj)
                elif omod.startswith(PKG + "."):
                    rel = omod[len(PKG) + 1:]
                    deps.update(closure.get(rel, frozenset({rel})))

    visit(fn)
    deps.discard("queries")
    return frozenset(deps), "\n".join(sorted(set(helper_srcs)))


def current_hashes(
    module_hashes: dict[str, str] | None = None,
) -> dict[str, str]:
    """v2 hashes. ``module_hashes`` is injectable so the synthetic-edit
    test can perturb one module and watch consumers flip."""
    import dataflow_flex_pyarrow_to_gds_spark.queries as C

    closure, real_hashes = module_closures()
    mh = module_hashes if module_hashes is not None else real_hashes
    out = {}
    for name, spec in C._specs().items():
        deps, helper_src = query_deps(spec.fn, closure)
        dep_part = "\n".join(
            f"{d}={mh.get(d, '?')}" for d in sorted(deps)
        )
        src = (
            inspect.getsource(spec.fn)
            + "\n---helpers---\n" + helper_src
            + "\n---oracle---\n" + (spec.oracle or "")
            + "\n---modules---\n" + dep_part
        )
        out[name] = hashlib.sha256(src.encode()).hexdigest()
    return out


def v1_hashes() -> dict[str, str]:
    import dataflow_flex_pyarrow_to_gds_spark.queries as C

    out = {}
    for name, spec in C._specs().items():
        src = inspect.getsource(spec.fn) + "\n---oracle---\n" + (
            spec.oracle or ""
        )
        out[name] = hashlib.sha256(src.encode()).hexdigest()
    return out


def main() -> int:
    import dataflow_flex_pyarrow_to_gds_spark.queries as C

    if "--update" in sys.argv:
        cur = current_hashes()
        with open(MANIFEST, "w") as f:
            json.dump({"format": 2, "hashes": cur}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {len(cur)} v2 hashes to {MANIFEST}")
        return 0
    if not os.path.exists(MANIFEST):
        print(
            "FAIL  no manifest — run scripts/check_window.py --update "
            "when cutting the round"
        )
        return 1
    with open(MANIFEST) as f:
        manifest = json.load(f)
    if isinstance(manifest, dict) and manifest.get("format") == 2:
        prev = manifest["hashes"]
        cur = current_hashes()
        fmt = "v2"
    else:  # legacy flat dict: compare on the v1 surface
        prev = manifest
        cur = v1_hashes()
        fmt = "v1 (legacy — run --update to upgrade to the module-aware v2)"
    window = set(list(C.queries())[: C.DRIVER_WINDOW])
    # Hash-bound local re-verification evidence (ADVICE r12): a CHANGED
    # query beyond the window passes iff scripts/local_verified.json
    # holds an entry recorded by a GREEN check_oracle.py --record run at
    # the query's CURRENT v2 hash. Evidence self-invalidates on any
    # further change; NEW queries never pass on evidence — they must
    # enter the window for real driver verification.
    evid_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "local_verified.json"
    )
    evidence: dict[str, dict] = {}
    if os.path.exists(evid_path):
        with open(evid_path) as f:
            evidence = json.load(f)
    bad = []
    reverified = 0
    for name, h in cur.items():
        if prev.get(name) == h or name in window:
            continue
        ev = evidence.get(name)
        if name in prev and ev and ev.get("hash") == h:
            reverified += 1
            continue
        bad.append(name)
    for name in bad:
        why = "NEW" if name not in prev else "CHANGED"
        print(
            f"FAIL  {name}: {why} since the last manifest, beyond the "
            f"driver window (window={C.DRIVER_WINDOW}), and no "
            "current-hash entry in local_verified.json — re-window it "
            "or re-verify with scripts/check_oracle.py --record"
        )
    if bad:
        return 1
    n_changed = sum(1 for name, h in cur.items() if prev.get(name) != h)
    print(
        f"OK  {len(cur)} queries [{fmt}]; {n_changed} changed/new — "
        f"{n_changed - reverified} inside the driver window, "
        f"{reverified} beyond it with current-hash local re-verification "
        "evidence"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
