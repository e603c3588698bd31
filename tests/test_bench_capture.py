"""Capture-size contract tests (r11 verdict item 1).

The driver records only the last 2000 characters of bench.py stdout;
round 10's 2020-char final line arrived with its head cut off and
``parsed: null``, breaking the mechanical gate on the committed
artifact. These tests pin the fix: extended-headline aliases keep the
final line under budget, baseline_check expands them back, and the
known damage mode is recoverable for old artifacts.

No SparkSession needed — everything here is pure-Python format logic.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import EXT_ALIAS, HEADLINE, MAX_LINE  # noqa: E402


def test_ext_alias_covers_exactly_positions_21_plus():
    assert set(EXT_ALIAS) == set(HEADLINE[20:])


def test_ext_alias_is_bijective_and_disjoint_from_real_names():
    assert len(set(EXT_ALIAS.values())) == len(EXT_ALIAS)
    # an alias colliding with a real query name would make expansion
    # ambiguous in baseline_check
    assert not set(EXT_ALIAS.values()) & set(HEADLINE)


def test_worst_case_final_line_fits_capture_budget():
    # worst case: every query measured, every value 4 digits + 3
    # decimals (9999.999 s — far beyond anything real)
    payload = {
        "metric": "headline_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "shared20_total_sec": 9999.999,
        "queries": {k: 9999.999 for k in HEADLINE[:20]},
        "ext": {EXT_ALIAS[k]: 9999.999 for k in HEADLINE[20:]},
        "sf": 0.1,
    }
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= MAX_LINE, (
        f"{len(line)} chars — the final bench line would outgrow the "
        "driver's 2000-char stdout tail again"
    )


def _run_check(tmp_path, artifact: dict) -> subprocess.CompletedProcess:
    p = tmp_path / "bench_artifact.json"
    p.write_text(json.dumps(artifact))
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "baseline_check.py"), str(p)],
        capture_output=True,
        text=True,
    )


def _full_green_payload() -> dict:
    # every query at a hair under its standing baseline -> within gate
    text = open(os.path.join(ROOT, "BASELINE.md")).read()
    import re

    base = json.loads(
        re.search(r"<!-- BASELINE_JSON\n(.*?)\nBASELINE_JSON -->", text, re.S).group(1)
    )
    ext = json.loads(
        re.search(r"<!-- EXTENDED_JSON\n(.*?)\nEXTENDED_JSON -->", text, re.S).group(1)
    )
    queries = {k: round(v * 0.9, 3) for k, v in base["queries"].items()}
    extq = {EXT_ALIAS[k]: round(v * 0.9, 3) for k, v in ext["queries"].items()}
    return {
        "metric": "headline_total_sec",
        "value": round(sum(queries.values()) + sum(extq.values()), 3),
        "unit": "sec",
        "shared20_total_sec": round(sum(queries.values()), 3),
        "queries": queries,
        "ext": extq,
        "sf": 0.1,
    }


def test_baseline_check_expands_aliases_and_gates_green(tmp_path):
    line = json.dumps(_full_green_payload(), separators=(",", ":"))
    assert len(line) <= MAX_LINE
    res = _run_check(tmp_path, {"tail": "noise\n" + line + "\n", "parsed": None})
    out = json.loads(res.stdout)
    assert res.returncode == 0, res.stdout + res.stderr
    assert out["within_gate"] is True
    assert out["missing"] == [] and out["extended_missing"] == []


def test_baseline_check_flags_aliased_excursion(tmp_path):
    payload = _full_green_payload()
    payload["ext"][EXT_ALIAS["semantic_dedup"]] = 999.0  # way over 2x
    line = json.dumps(payload, separators=(",", ":"))
    res = _run_check(tmp_path, {"tail": line + "\n", "parsed": None})
    out = json.loads(res.stdout)
    assert res.returncode == 1
    # flagged under the FULL name, not the alias
    assert "semantic_dedup" in out["per_query_over_factor"]


def test_baseline_check_recovers_headless_tail_damage(tmp_path):
    # reproduce the exact r10 damage: final line longer than the tail
    # window, capture starts mid-"metric"
    payload = _full_green_payload()
    # old format: everything under "queries" with full names
    payload["queries"] = {
        **payload["queries"],
        **{full: payload["ext"][a] for full, a in EXT_ALIAS.items()},
    }
    del payload["ext"]
    line = json.dumps(payload) + "\n"
    damaged_tail = line[len('{"metric": "headline_') :]
    res = _run_check(tmp_path, {"tail": damaged_tail, "parsed": None})
    out = json.loads(res.stdout)
    assert res.returncode == 0, res.stdout + res.stderr
    assert out["within_gate"] is True


def test_committed_r10_artifact_now_gates_green():
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "scripts", "baseline_check.py"),
            os.path.join(ROOT, "BENCH_r10.json"),
        ],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    out = json.loads(res.stdout)
    assert out["within_gate"] is True
    assert out["extended_missing"] == []
