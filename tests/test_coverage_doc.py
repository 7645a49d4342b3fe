"""COVERAGE.md must stay in sync with the registry."""

from __future__ import annotations

from pathlib import Path


def test_coverage_doc_is_fresh():
    from tools.gen_coverage import coverage_markdown

    on_disk = Path(__file__).resolve().parent.parent / "COVERAGE.md"
    assert on_disk.read_text() == coverage_markdown(), (
        "COVERAGE.md is stale — run tools/gen_coverage.py"
    )
