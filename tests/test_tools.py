"""Unit tests for repo tooling that needs no Spark session."""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prev_round_tree_resolves_prior_round_not_head():
    """r11 review fix: the A/B instrument's "previous tree" must be a
    real prior round boundary — subject-matched (not a body-line grep
    hit) and never HEAD itself (a bench re-run right after a round
    commit lands would otherwise compare the tree to itself and report
    paired ~1.0 as 'no plan regression')."""
    from tools.bench_ab import prev_round_tree

    try:
        dest, sha, subject = prev_round_tree(REPO)
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        assert sha != head
        assert re.match(r"^round \d+:", subject), subject
        assert os.path.exists(os.path.join(dest, "__spark_entry__.py"))
        assert os.path.exists(os.path.join(dest, "bench.py"))
    finally:
        shutil.rmtree(os.path.join(REPO, ".bench_ab"), ignore_errors=True)
