"""One source of truth for the headline number: the newest BENCH_r*.json.

VERDICT r3 #7: bench.py's fail-fast ``last_live_*`` fields and the README/NEXT
headlines drifted from the driver artifact (2742.14/0.4869 vs 2735.13/0.4856).
These tests make divergence a failure:

- ``last_driver_measurement()`` must return exactly the newest artifact's
  parsed values (that function feeds bench.py's fail-fast JSON).
- Any doc line that quotes a throughput/MFU **and cites a BENCH_rNN.json**
  must match that artifact bit-for-bit. Historical numbers in BENCH.md's
  measurement log are fine — they don't cite an artifact on the same line.
"""
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifacts():
    out = {}
    for fn in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        with open(os.path.join(REPO, fn)) as f:
            parsed = json.load(f).get("parsed") or {}
        out[int(m.group(1))] = parsed
    return out


def test_last_driver_measurement_matches_newest_artifact():
    import bench

    arts = {n: p for n, p in _artifacts().items() if p.get("value", 0) > 0}
    got = bench.last_driver_measurement(REPO)
    if not arts:
        assert got == {}
        return
    n = max(arts)
    assert got["last_live_value"] == arts[n]["value"]
    assert got["last_live_round"] == n
    if "mfu" in arts[n]:
        assert got["last_live_mfu"] == arts[n]["mfu"]


# doc lines like "**2735 slices/s / 48.6% MFU** ... (BENCH_r03.json)" must
# match the artifact they cite (value rounded to the precision quoted)
_CITE = re.compile(r"BENCH_r(\d+)\.json")
_VAL = re.compile(r"(\d{3,5}(?:\.\d+)?)\s*slices/s")
_MFU = re.compile(r"(\d{1,2}(?:\.\d+)?)%\s*MFU")


@pytest.mark.parametrize("doc", ["README.md", "NEXT.md", "docs/MIGRATION.md",
                                 "BENCH.md"])
def test_doc_headlines_match_cited_artifact(doc):
    path = os.path.join(REPO, doc)
    if not os.path.exists(path):
        pytest.skip(f"{doc} absent")
    arts = _artifacts()
    with open(path) as f:
        lines = f.readlines()
    checked = 0
    for i, line in enumerate(lines, 1):
        cite = _CITE.search(line)
        if not cite:
            continue
        parsed = arts.get(int(cite.group(1)))
        if not parsed or parsed.get("value", 0) <= 0:
            continue
        vm = _VAL.search(line)
        if vm:
            quoted = float(vm.group(1))
            decimals = len(vm.group(1).split(".")[1]) if "." in vm.group(1) else 0
            assert quoted == round(parsed["value"], decimals), (
                f"{doc}:{i} quotes {quoted} slices/s but cites "
                f"BENCH_r{int(cite.group(1)):02d}.json = {parsed['value']}")
            checked += 1
        mm = _MFU.search(line)
        if mm and "mfu" in parsed:
            quoted = float(mm.group(1))
            decimals = len(mm.group(1).split(".")[1]) if "." in mm.group(1) else 0
            assert quoted == round(parsed["mfu"] * 100, decimals), (
                f"{doc}:{i} quotes {quoted}% MFU but cites "
                f"BENCH_r{int(cite.group(1)):02d}.json = {parsed['mfu']}")
            checked += 1
    # README and NEXT must carry at least one artifact-cited headline once
    # artifacts exist (the whole point of #7); BENCH/MIGRATION may log history
    if doc in ("README.md", "NEXT.md") and any(
            p.get("value", 0) > 0 for p in arts.values()):
        assert checked > 0, (
            f"{doc} has no headline that cites a BENCH_r*.json artifact — "
            "the headline must quote the driver artifact")
