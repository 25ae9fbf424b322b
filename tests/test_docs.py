"""Docs/CI pipeline sanity (reference parity: mkdocs.yml +
.github/workflows/deploy-docs.yml — theirs builds docs only; our CI also
runs the test suite).

mkdocs itself is not installed in the dev image, so these tests validate
the build inputs structurally: the YAML parses, every nav entry points at a
committed markdown file, and no committed doc page is orphaned from nav.
"""
from __future__ import annotations

import pathlib

import yaml

REPO = pathlib.Path(__file__).resolve().parents[1]


def _nav_paths(nav) -> list:
    out = []
    for item in nav:
        if isinstance(item, dict):
            for v in item.values():
                if isinstance(v, list):
                    out += _nav_paths(v)
                else:
                    out.append(v)
        else:
            out.append(item)
    return out


def test_mkdocs_config_parses_and_nav_paths_exist():
    cfg = yaml.safe_load((REPO / "mkdocs.yml").read_text())
    docs_dir = REPO / cfg.get("docs_dir", "docs")
    assert docs_dir.is_dir()
    paths = _nav_paths(cfg["nav"])
    assert paths, "empty nav"
    for p in paths:
        assert (docs_dir / p).is_file(), f"nav entry missing: {p}"


def test_all_doc_pages_reachable_from_nav():
    cfg = yaml.safe_load((REPO / "mkdocs.yml").read_text())
    docs_dir = REPO / cfg.get("docs_dir", "docs")
    nav = {str(p) for p in _nav_paths(cfg["nav"])}
    on_disk = {str(p.relative_to(docs_dir))
               for p in docs_dir.rglob("*.md")}
    orphans = on_disk - nav
    assert not orphans, f"doc pages not in nav: {sorted(orphans)}"


def test_ci_workflow_parses_and_runs_tests():
    wf = yaml.safe_load(
        (REPO / ".github" / "workflows" / "ci.yml").read_text())
    jobs = wf["jobs"]
    assert "test" in jobs and "docs" in jobs
    test_steps = " ".join(
        str(s.get("run", "")) for s in jobs["test"]["steps"])
    assert "pytest" in test_steps
    docs_steps = " ".join(
        str(s.get("run", "")) for s in jobs["docs"]["steps"])
    assert "mkdocs build" in docs_steps
