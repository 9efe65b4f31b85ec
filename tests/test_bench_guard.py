"""Pins for bench.py's committed-record adjudication gate (round-14
structural fix for the round-13 'busy-box record became the on-record
number' failure): a --commit run carrying un-adjudicated >1.3x deltas
must refuse to replace BENCH_COMMITTED.json."""

from __future__ import annotations

from bench import adjudication_gate

DELTAS = {"q1": {"prev": 1.0, "now": 2.0, "ratio": 2.0}}


def test_flagged_run_without_attestation_refuses():
    refused, note = adjudication_gate(DELTAS, ["bench.py", "--commit"])
    assert refused and note is None


def test_flagged_run_with_attestation_commits_and_records_note():
    refused, note = adjudication_gate(
        DELTAS,
        ["bench.py", "--commit", "--adjudicated=q1 noise-band 0.95"],
    )
    assert not refused
    assert note == "q1 noise-band 0.95"


def test_empty_attestation_does_not_count():
    refused, note = adjudication_gate(
        DELTAS, ["bench.py", "--commit", "--adjudicated="]
    )
    assert refused and note is None


def test_clean_run_commits_without_attestation():
    refused, note = adjudication_gate({}, ["bench.py", "--commit"])
    assert not refused and note is None
