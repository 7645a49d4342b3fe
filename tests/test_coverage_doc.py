"""COVERAGE.md must stay in sync with the registry."""

from __future__ import annotations

from pathlib import Path


def test_coverage_doc_is_fresh():
    from tools.gen_coverage import coverage_markdown

    on_disk = Path(__file__).resolve().parent.parent / "COVERAGE.md"
    assert on_disk.read_text() == coverage_markdown(), (
        "COVERAGE.md is stale — run tools/gen_coverage.py"
    )


def test_driver_verified_red_grades_requeue(tmp_path):
    """Round-6 review finding: a RED or erred latest driver grade must NOT
    count as verified (it would rank the query BEHIND the never-graded
    tail). Later round files override earlier verdicts name-by-name, so a
    red that later re-grades green counts again."""
    import json

    from sealnet_etl_spark.catalog import _REGRADE_FIRST, _load_driver_verified

    g = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    err = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
    ro = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_green": g, "q_red_then_green": red, "q_went_red": g, "q_rows_only": ro})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_red_then_green": g, "q_went_red": err})
    )
    verified, last_round = _load_driver_verified(tmp_path)
    assert "q_green" in verified
    assert "q_red_then_green" in verified  # latest verdict wins
    assert "q_went_red" not in verified  # erred latest grade re-queues
    assert "q_rows_only" in verified  # rows-only without error is green
    assert not (verified & set(_REGRADE_FIRST))
    # VERDICT r9 #3: tier 3 rotates oldest-evidence-first, so the loader
    # must report each name's LATEST graded round for the sort key.
    assert last_round["q_green"] == 1
    assert last_round["q_red_then_green"] == 2


def test_tier3_orders_oldest_grade_first():
    """VERDICT r9 #3: within the long-green tier, a query last graded in
    round 1 must enter the driver's ~50-slot window before one last
    graded in round 9 — registration order alone never rotates the tail."""
    from sealnet_etl_spark import catalog

    orig_verified = catalog._DRIVER_VERIFIED
    orig_last = catalog._LAST_GRADED
    try:
        catalog._DRIVER_VERIFIED = frozenset({"q_old", "q_new"})
        catalog._LAST_GRADED = {"q_old": 1, "q_new": 9}
        assert catalog._grade_rank("q_old") < catalog._grade_rank("q_new")
    finally:
        catalog._DRIVER_VERIFIED = orig_verified
        catalog._LAST_GRADED = orig_last


def test_tail_entry_with_driver_evidence_folds_out():
    """ADVICE r6: a _NEVER_GRADED entry already proven green in a round
    file must rank in the verified tier, not keep a tier-1 window slot
    until the tuple is hand-edited. ADVICE r7: patch BOTH branches of
    _DRIVER_VERIFIED explicitly — the tree may legitimately carry driver
    evidence for the tail entry (the fold-out working as designed), so the
    no-evidence branch must subtract it rather than assume its absence.
    When the tail is empty, exercise the same invariant on a synthetic
    name (never in any round file)."""
    from sealnet_etl_spark import catalog

    tail_name = (
        catalog._NEVER_GRADED[0]
        if catalog._NEVER_GRADED
        else "zz_synthetic_tail_entry"
    )
    tail_tuple = catalog._NEVER_GRADED or (tail_name,)
    orig_verified = catalog._DRIVER_VERIFIED
    orig_tail = catalog._NEVER_GRADED
    try:
        catalog._NEVER_GRADED = tail_tuple
        catalog._DRIVER_VERIFIED = orig_verified | {tail_name}
        assert catalog._grade_rank(tail_name)[0] == 3  # evidence -> folds out
        catalog._DRIVER_VERIFIED = orig_verified - {tail_name}
        assert catalog._grade_rank(tail_name)[0] == 1  # no evidence -> window
    finally:
        catalog._DRIVER_VERIFIED = orig_verified
        catalog._NEVER_GRADED = orig_tail
