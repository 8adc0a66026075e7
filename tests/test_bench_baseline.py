"""BENCH/BASELINE.md ownership contract: the scaling writer in
bench.py regenerates only its own sections and must carry every
appended section (noise-band table, A/B regression control) through a
re-measure unchanged — the first round-5 scaling run silently dropped
both."""

from __future__ import annotations

import pathlib

import bench

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_preserved_tail_keeps_appended_sections():
    body = (
        "# BENCH/BASELINE — measured numbers\n\n"
        "## Scaling protocol (north_rule: efficiency >= 0.8, N -> 4N)\n\n"
        "...\n\n## Saturation notes (why not local[8] vs local[32])\n\n"
        "...\n"
    )
    tail = (
        "## Per-query noise bands (rounds 1-5 history, 40 runs)\n\n"
        "| query | n |\n|---|---|\n\n"
        "## Same-host A/B regression control (round 5)\n\nproof text\n"
    )
    got = bench._preserved_tail(body + tail)
    # everything from the first appended section onward, verbatim
    assert got == "\n" + tail
    # regenerated body + preserved tail reconstructs a full file
    assert (body.rstrip("\n") + got).endswith(tail)


def test_preserved_tail_order_independent():
    # A/B section written before the noise bands still anchors the cut
    text = "# x\n\n## Same-host A/B regression control\n\nab\n\n" \
           "## Per-query noise bands\n\ntable\n"
    got = bench._preserved_tail(text)
    assert got.startswith("\n## Same-host A/B")
    assert "## Per-query noise bands" in got


def test_preserved_tail_absent_sections():
    assert bench._preserved_tail("# BENCH/BASELINE\n\n## Scaling protocol\n") == ""
    assert bench._preserved_tail("") == ""


def test_baseline_on_disk_round_trips():
    """The real artifact must survive the writer: its preserved tail
    contains both appended sections and nothing of the scaling body."""
    text = (ROOT / "BENCH/BASELINE.md").read_text()
    tail = bench._preserved_tail(text)
    assert "## Per-query noise bands" in tail
    assert "## Same-host A/B regression control" in tail
    assert "## Scaling protocol" not in tail
