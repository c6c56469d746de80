#!/usr/bin/env python
"""Regenerate the REGISTRY ordering in queries.py from the attestation
manifest: pending queries first (driver window), then attested queries by
ascending attested_round (stalest first, so window spill-over refreshes
them). Entry lines are preserved verbatim; only their order changes —
fn/SQL sources (and therefore fingerprints) are untouched. Run after any
operator edit, then `python tools/attest.py` to regenerate the manifest.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import attest  # noqa: E402

QPATH = os.path.join(REPO, "work_order_pdf_extractor_spark", "queries.py")

HEADER = """\
    # Ordering IS the attestation policy: the driver checks the first 50
    # slots, and tools/attest.py mechanically derives which queries are
    # "pending" (changed since their last green driver row, per content
    # fingerprint over fn + oracle + dependency-module closure). Every
    # pending query MUST sit in this first block; tests/test_attestation
    # enforces it against the committed ATTESTATION.json. This block was
    # regenerated programmatically from the manifest (pending first, then
    # attested by ascending attested_round so the stalest attestations
    # refresh in the window spill-over slots).
"""


def main() -> int:
    with open(QPATH, encoding="utf-8") as f:
        text = f.read()
    m = re.search(
        r"^REGISTRY: dict\[str, tuple\[Callable, str \| None\]\] = \{\n(.*?)^\}\n",
        text,
        re.S | re.M,
    )
    if not m:
        print("REGISTRY literal not found")
        return 1
    body = m.group(1)
    entries: dict[str, str] = {}
    for line in body.splitlines():
        em = re.match(r'\s*"([^"]+)":\s*\(.*\),\s*$', line)
        if em:
            entries[em.group(1)] = line
    manifest = attest.build_manifest()
    qs = manifest["queries"]
    missing = set(entries) ^ set(qs)
    if missing:
        print(f"registry/manifest mismatch: {sorted(missing)}")
        return 1
    # When pending overflows the 50-slot window, the overflow lands at
    # the END of the pending block; sort so the least-risky entries
    # (module-text-only fingerprint changes with no behavior delta,
    # e.g. frame_sample's pure plan arithmetic) overflow first.
    overflow_last = ["frame_sample", "mulaw_decode", "audio_decode"]
    pending = sorted(
        (q for q in entries if qs[q]["status"] == "pending"),
        key=lambda q: (
            overflow_last.index(q) + 1 if q in overflow_last else 0
        ),
    )
    attested = sorted(
        (q for q in entries if qs[q]["status"] == "attested"),
        key=lambda q: (qs[q]["attested_round"], q),
    )
    lines = [HEADER.rstrip("\n")]
    lines.append(
        "    # -- block 0: pending per ATTESTATION.json (changed / new / stale) ----"
    )
    lines.extend(entries[q] for q in pending)
    lines.append(
        "    # -- attested, stalest attested_round first ---------------------------"
    )
    lines.extend(entries[q] for q in attested)
    new_body = "\n".join(lines) + "\n"
    new_text = text[: m.start(1)] + new_body + text[m.end(1) :]
    with open(QPATH, "w", encoding="utf-8") as f:
        f.write(new_text)
    print(
        f"reordered: {len(pending)} pending first, {len(attested)} attested"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
