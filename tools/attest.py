#!/usr/bin/env python
"""Attestation manifest generator (VERDICT r3 ask #1).

The driver's correctness gate checks the first 50 registry slots per
round; with 90+ registered queries the rotation policy ("changed / new /
never-checked first, twice-green tail") needs to be *mechanically*
verifiable, not bookkeeping the judge must re-derive from `git diff`.
This tool makes it one-read checkable:

For every query in the registry it computes a content FINGERPRINT — a
sha256 over the query function's source, its oracle SQL, and the full
text of every package module in the query's transitive dependency
closure (resolved by AST import analysis plus identifier scanning, which
deliberately over-includes: a false dependency can only mark a query
stale and force re-attestation, never hide a change). The same
extraction runs against the git tree of each past driver round (the
round-N driver commit touches only report files, so its tree IS the code
the driver tested). A query is ATTESTED at round N iff round N's
CORRECTNESS json has a fully-green row for it AND its fingerprint at
that round's tree equals its fingerprint at HEAD.

Output: ATTESTATION.json — per query: current fingerprint, the latest
attesting round (or null), and status `attested` / `pending`. Queries
whose status is `pending` are exactly the ones the registry must rotate
into the next driver window; `python tools/attest.py --check-window`
exits nonzero if any pending query sits outside the first 50 slots.

Run `python tools/attest.py` from the repo root each round after editing
queries/operators; commit the regenerated manifest.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "work_order_pdf_extractor_spark"
QUERIES_PATH = f"{PKG}/queries.py"
WINDOW = 50  # driver checks the first WINDOW registry slots per round

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def _read(path: str, rev: str | None) -> str | None:
    """File text at a git rev, or from the working tree when rev is None."""
    if rev is None:
        p = os.path.join(REPO, path)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return f.read()
    try:
        return _git("show", f"{rev}:{path}")
    except subprocess.CalledProcessError:
        return None


def _pkg_files(rev: str | None) -> dict[str, str]:
    """module-path (dotted, package-relative) -> file text, for every .py
    under the package at the given tree."""
    if rev is None:
        names = []
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in files:
                if f.endswith(".py"):
                    rel = os.path.relpath(os.path.join(root, f), REPO)
                    names.append(rel.replace(os.sep, "/"))
    else:
        names = [
            n
            for n in _git("ls-tree", "-r", "--name-only", rev, PKG).splitlines()
            if n.endswith(".py")
        ]
    out = {}
    for n in sorted(names):
        dotted = n[len(PKG) + 1 : -3].replace("/", ".")  # e.g. operators.fuzzy
        text = _read(n, rev)
        if text is not None:
            out[dotted] = text
    return out


class _QueriesIndex:
    """AST index of queries.py: top-level defs/assigns, import-symbol ->
    module mapping, and the REGISTRY literal."""

    def __init__(self, text: str, modules: dict[str, str]):
        self.text = text
        tree = ast.parse(text)
        self.defs: dict[str, str] = {}
        self.import_symbol_module: dict[str, str] = {}
        self.registry: dict[str, tuple[str, str | None]] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                self.defs[node.name] = ast.get_source_segment(text, node) or ""
            elif isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                if isinstance(t, ast.Name):
                    src = ast.get_source_segment(text, node) or ""
                    if t.id == "REGISTRY":
                        self._parse_registry(node.value)
                    else:
                        self.defs[t.id] = src
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                src = ast.get_source_segment(text, node) or ""
                if node.target.id == "REGISTRY" and node.value is not None:
                    self._parse_registry(node.value)
                else:
                    self.defs[node.target.id] = src
            elif isinstance(node, ast.ImportFrom) and node.level >= 1:
                base = node.module or ""
                for alias in node.names:
                    local = alias.asname or alias.name
                    # `from .operators import dedup` -> symbol dedup is
                    # the MODULE operators.dedup; `from .operators.x
                    # import Y` -> symbol Y lives in module operators.x
                    cand_mod = f"{base}.{alias.name}" if base else alias.name
                    if cand_mod in modules:
                        self.import_symbol_module[local] = cand_mod
                    elif base in modules:
                        self.import_symbol_module[local] = base

    def _parse_registry(self, value: ast.expr) -> None:
        if not isinstance(value, ast.Dict):
            return
        for k, v in zip(value.keys, value.values):
            if not isinstance(k, ast.Constant) or not isinstance(v, ast.Tuple):
                continue
            fn = v.elts[0].id if isinstance(v.elts[0], ast.Name) else None
            sql_node = v.elts[1] if len(v.elts) > 1 else None
            sql = sql_node.id if isinstance(sql_node, ast.Name) else None
            if fn:
                self.registry[str(k.value)] = (fn, sql)


def _module_imports(dotted: str, text: str, modules: dict[str, str]) -> set[str]:
    """Package-relative modules a module file imports (AST, precise)."""
    out: set[str] = set()
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return out
    pkg_parts = dotted.split(".")[:-1]  # e.g. ['operators']
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.level >= 1:
            anchor = pkg_parts[: len(pkg_parts) - (node.level - 1)]
            base = ".".join(anchor + (node.module.split(".") if node.module else []))
            for alias in node.names:
                cand = f"{base}.{alias.name}" if base else alias.name
                if cand in modules:
                    out.add(cand)
                elif base in modules:
                    out.add(base)
    return out


def _scan_def(src: str, modules: dict[str, str]) -> tuple[set[str], set[str]]:
    """(referenced identifier names, package modules imported/attributed)
    for one top-level def/assign source segment. AST-based so prose in
    docstrings ("semi-join membership") can never alias a module name;
    falls back to a raw identifier scan (over-inclusive, still safe) if
    the segment does not parse standalone."""
    names: set[str] = set()
    mods: set[str] = set()
    basenames = {m.rsplit(".", 1)[-1]: m for m in modules}
    try:
        tree = ast.parse(src)
    except SyntaxError:
        idents = set(_IDENT.findall(src))
        return idents, {basenames[i] for i in idents if i in basenames}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(
            node.value, ast.Name
        ):
            # module-style usage: fuzzy.fuzzy_semi_join(...)
            if node.value.id in basenames:
                mods.add(basenames[node.value.id])
        elif isinstance(node, ast.ImportFrom) and node.level >= 1:
            base = node.module or ""
            for alias in node.names:
                cand = f"{base}.{alias.name}" if base else alias.name
                if cand in modules:
                    mods.add(cand)
                elif base in modules:
                    mods.add(base)
    return names, mods


def fingerprints(rev: str | None) -> dict[str, str]:
    """query name -> sha256 content fingerprint at the given tree."""
    modules = _pkg_files(rev)
    qtext = modules.pop("queries", None)
    if qtext is None:
        return {}
    modules.pop("__init__", None)
    idx = _QueriesIndex(qtext, modules)

    out = {}
    for name, (fn_name, sql_name) in idx.registry.items():
        parts: dict[str, str] = {}
        pending = [fn_name] + ([sql_name] if sql_name else [])
        seen_defs: set[str] = set()
        dep_mods: set[str] = set()
        # BFS over queries.py-local helpers; collect module references
        while pending:
            d = pending.pop()
            if d in seen_defs or d not in idx.defs:
                continue
            seen_defs.add(d)
            src = idx.defs[d]
            parts[f"def:{d}"] = src
            idents, ref_mods = _scan_def(src, modules)
            dep_mods |= ref_mods
            pending.extend(i for i in idents if i in idx.defs and i not in seen_defs)
            for i in idents:
                if i in idx.import_symbol_module:
                    dep_mods.add(idx.import_symbol_module[i])
        # transitive closure over package-internal imports of dep modules
        mq = sorted(dep_mods)
        closed: set[str] = set()
        while mq:
            m = mq.pop()
            if m in closed or m not in modules:
                continue
            closed.add(m)
            parts[f"mod:{m}"] = modules[m]
            mq.extend(_module_imports(m, modules[m], modules) - closed)
        payload = "\n\x00\n".join(f"{k}\n{v}" for k, v in sorted(parts.items()))
        out[name] = hashlib.sha256(payload.encode()).hexdigest()
    return out


def _rounds() -> list[tuple[int, str, dict]]:
    """(round, driver-commit, green-query->row) for each recorded round."""
    out = []
    r = 1
    while True:
        path = f"CORRECTNESS_r{r:02d}.json"
        if not os.path.exists(os.path.join(REPO, path)):
            break
        # Key the round to the NEWEST commit whose committed report blob
        # equals the on-disk report — the tree and the report content are
        # then guaranteed to come from the same commit (an amended or
        # re-added report keys to its re-add, never to a stale first-add
        # tree; a formatting edit can shift the key but can never pair
        # this content with a tree that doesn't contain it). An untracked
        # or locally-modified report matches no commit and falls back to
        # the working tree (rev None) — the driver runs against a clean
        # checkout, so at round start the working tree IS the tested code.
        with open(os.path.join(REPO, path), "rb") as f:
            disk = f.read()
        commits = []
        for c in _git("log", "--format=%H", "--", path).splitlines():
            try:
                blob = subprocess.run(
                    ["git", "show", f"{c}:{path}"],
                    cwd=REPO, check=True, capture_output=True,
                ).stdout
            except subprocess.CalledProcessError:
                continue
            if blob == disk:
                commits = [c]
                break
        with open(os.path.join(REPO, path), encoding="utf-8") as f:
            rows = json.load(f)
        green = {
            q: row
            for q, row in rows.items()
            if row.get("rows_match")
            and row.get("schema_match")
            and (row.get("hash_match") in (True, None))
            and not row.get("err")
        }
        if not commits:
            print(
                f"WARNING: {path} matches no committed blob — round {r} "
                "keys to the WORKING TREE and is marked provisional "
                "(commit the driver report to pin it)",
                file=sys.stderr,
            )
        out.append((r, commits[0] if commits else None, green))
        r += 1
    return out


def build_manifest() -> dict:
    cur = fingerprints(None)
    rounds = _rounds()
    per_round_fp = {r: fingerprints(commit) for r, commit, _ in rounds}
    provisional = sorted(r for r, commit, _ in rounds if commit is None)
    queries = {}
    for name, fp in cur.items():
        attested = None
        for r, _commit, green in rounds:
            if name in green and per_round_fp[r].get(name) == fp:
                attested = r
        queries[name] = {
            "fingerprint": fp,
            "attested_round": attested,
            "status": "attested" if attested else "pending",
        }
        # An attestation keyed to the working tree (driver report not
        # yet committed) is real evidence only if the tree is untouched
        # since the driver ran — surface that caveat explicitly.
        if attested in provisional:
            queries[name]["provisional"] = True
    pending = [q for q, v in queries.items() if v["status"] == "pending"]
    order = list(cur)  # registry order == driver window order
    pending_outside = [q for q in pending if order.index(q) >= WINDOW]
    attested_inside = [
        q for q in order[:WINDOW] if queries[q]["status"] == "attested"
    ]
    # the enforceable invariant: no window slot may be WASTED — an
    # attested query sitting inside while a pending one waits outside.
    # When pending > WINDOW the overflow is unavoidable (it becomes the
    # next round's head) and is reported, not flagged.
    violations = pending_outside if attested_inside else []
    return {
        "scheme": (
            "fingerprint = sha256(query fn source + oracle SQL source + "
            "transitive package-module dependency texts); attested at round "
            "N iff CORRECTNESS_rN row fully green AND fingerprint at that "
            "round's driver-commit tree == fingerprint at HEAD"
        ),
        "window": WINDOW,
        "provisional_rounds": provisional,
        "n_queries": len(queries),
        "n_attested": len(queries) - len(pending),
        "pending": pending,
        "pending_overflow": pending_outside,
        "pending_outside_window": violations,
        "queries": queries,
    }


def _round_start() -> int:
    """Scripted round-start step (VERDICT r5 ask #2): verify every driver
    report (CORRECTNESS_r*.json, BENCH_r*.json) is committed and
    byte-identical to its committed blob, regenerate the manifest, and
    fail loudly if any round would key to the working tree. Run this
    FIRST THING each round, then commit the regenerated manifest with
    the round's driver artifacts if anything changed."""
    import glob

    dirty = []
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        + glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    ):
        rel = os.path.relpath(path, REPO)
        status = _git("status", "--porcelain", "--", rel).strip()
        if status:
            dirty.append(f"{rel} ({status.split()[0]})")
    manifest = build_manifest()
    ok = not dirty and not manifest["provisional_rounds"]
    _round_start.manifest = manifest  # reuse in main(): build is expensive
    print(
        f"round-start: {manifest['n_attested']}/{manifest['n_queries']} "
        f"attested; uncommitted driver reports: {dirty or 'none'}; "
        f"provisional rounds: {manifest['provisional_rounds'] or 'none'}"
    )
    if not ok:
        print(
            "FAIL: commit the driver reports (and regenerated "
            "ATTESTATION.json) before editing code — attestations must "
            "key to an immutable tree."
        )
    return 0 if ok else 1


def main() -> int:
    manifest = None
    if "--round-start" in sys.argv:
        rc = _round_start()
        if rc:
            return rc
        manifest = getattr(_round_start, "manifest", None)
    if manifest is None:
        manifest = build_manifest()
    out_path = os.path.join(REPO, "ATTESTATION.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=False)
        f.write("\n")
    print(
        f"{manifest['n_attested']}/{manifest['n_queries']} attested; "
        f"pending: {manifest['pending']}"
    )
    if "--check-window" in sys.argv and manifest["pending_outside_window"]:
        print(
            "PENDING OUTSIDE WINDOW (rotate these into the first "
            f"{WINDOW} registry slots): {manifest['pending_outside_window']}"
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
