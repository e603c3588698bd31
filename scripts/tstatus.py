"""Emit TSTATUS_r{N}.json: a machine-readable ledger for the T-kind
(side-effect / no-DataFrame-return) components that the driver's
oracle gate cannot see. For each component it lists the pytest tests
whose body references the component's entry symbol, with each test's
pass/fail from a junit XML produced by the full-suite run:

    python -m pytest tests/ -q --junitxml=/tmp/junit_r6.xml
    python scripts/tstatus.py /tmp/junit_r6.xml TSTATUS_r06.json

A component with zero matching tests or any failing matched test is
reported so the round close-out catches it.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import sys
import xml.etree.ElementTree as ET

# SURVEY §2 T-kind components -> the symbol a covering test must
# reference (usually the operator function; overridden where the
# component is a family or a class method).
COMPONENTS: dict[str, str] = {
    "A3": "crawl_delimited",
    "A5": "tsv_to_parquet_job",
    "A7": "Lake",
    "A8": "ResultsZone",
    "A9": "run_cached",
    "A10": "AccessDenied",
    "A11": "crawl_grok",
    "A12": "test:test_crawler_discovers_hive_partitions",
    "A13": "crawl_xml",
    "A14": "delete_table",  # write-side governance (Lake.write/delete)
    "A15": "test:test_audit_log_concurrent_writers_land_intact_rows",
    "A16": "register_kvscan",
    "C13": "decode_real_media",
    "C31": "dedup_incremental",
    "C111": "modality_dedup_report",
    "E50": "stream_kcenter_maintain",
    "D32": "publish_tables",
    "E51": "vacuum_batch_snapshots",
    "E52": "stream_semantic_dedup_gate",
    "E53": "stream_source_tvd_monitor",
    "E54": "inspect_stream_state",
    "D33": "scan_lineage",
    "C59": "observe_metrics",
    "C68": "plan_minhash_bands",
    "C86": "ivf_index_build",
    "D1": "crawl_parquet",  # direct round-trip test added r6
    "D2": "write_bucketed",
    "D3": "compact",  # word-boundary match: dv_compact does NOT count
    "D4": "IncrementalIngest",
    # D5/D9 are Spark OPTION/CONF STRING KEYS, not code identifiers —
    # the AST matcher (correctly) never sees them, so they pin their
    # covering tests explicitly.
    "D5": "test:test_schema_evolution_merge",
    "D6": "crawl_json",
    "D7": "zorder_write",
    "D8": "merge_upsert",
    "D9": "test:test_dynamic_partition_overwrite",
    "D10": "delete_keys",
    "D11": "partition_stats",
    "D12": "snapshot_diff",
    "D13": "incremental_agg_refresh",
    "D14": "file_skipping_report",
    "D15": "schema_drift_report",
    "D16": "ledger_ingest",
    "D17": "collect_column_stats",
    "D18": "bloom_index_build",
    "D19": "minhash_index_build",
    "D20": "charspan_index_build",
    "D21": "sorted_export",
    "D22": "crawl_orc",
    "D23": "graph_edges_build",
    "D24": "repartition_layout",
    "D25": "dv_delete",
    "D26": "cdc_envelope_apply",
    "D27": "ivm_join_build",
    "D28": "hilbert_write",
    "D29": "contamination_index_build",
    "E1": "windowed_counts",
    "E2": "stream_dedup",
    "E3": "stream_sessionize",
    "E4": "running_user_totals",
    "E5": "upsert_sink",
    "E6": "stream_static_enrich",
    "E7": "stream_stream_conversions",
    # E8's component is the exactly-once restart semantics, not the
    # word "checkpoint" (which appears in dozens of unrelated tests):
    # pin the covering test function directly.
    "E8": "test:test_checkpointed_source_exactly_once_across_restarts",
    "E9": "stream_to_lake_versions",
    "E10": "timeout_closed_sessions",
    "E11": "curate_document_stream",
    "E12": "stream_dedup_gate",
    "E13": "quota_enforcer",
    "E14": "rate_limited_sink",
    "E15": "idle_key_eviction",
    "E16": "trending_topk",
    "E17": "psi_monitor_sink",
    "E18": "observed_event_stream",
    "E19": "tws_user_totals",
    "E20": "dlq_ingest",
    "E21": "idempotent_sink",
    "E22": "backfill_handoff",
    "E23": "gc_uncommitted",
    "E24": "column_stats_monitor",
    "E25": "tws_type_counts",
    "E26": "tws_recent_events",
    "E27": "tws_session_flush",
    "E28": "stream_phrase_monitor",
    "E29": "stream_bloom_gate",
    "E30": "stream_histogram_sink",
    "E31": "stream_minhash_dedup_gate",
    "E32": "stream_charspan_gate",
    "E33": "stream_anomaly_gate",
    "E34": "stream_cms_monitor",
    "E35": "stream_ivf_ingest",
    "E36": "stream_hll_monitor",
    "E37": "stream_baseline_monitor",
    "E38": "stream_image_dedup_gate",
    "E39": "stream_graph_edges",
    "E40": "stream_key_erasure",
    "E41": "stream_cdc_apply",
    "E42": "tws_ttl_totals",
    "E43": "stream_ivm_join",
    "E44": "stream_contamination_gate",
    "E45": "stream_boilerplate_gate",
    "E46": "stream_domain_cap_gate",
    "D30": "knn_graph_index_build",
    "E47": "stream_knn_insert",
    "E48": "stream_reservoir_sample",
    "D31": "tokenizer_index_build",
    "E49": "stream_tokenize_gate",
}


def collect_tests(repo: str) -> dict[str, list[tuple[str, str]]]:
    """symbol -> [(module, test_name)] for tests whose body references
    it as a CODE identifier — AST Name/Attribute/import nodes, never
    raw source text, so neither substrings (dv_compact vs 'compact',
    localCheckpoint vs 'checkpoint') nor prose mentions in docstrings
    and comments count as coverage. A "test:<name>" symbol pins an
    explicit test function instead of searching."""
    hits: dict[str, list[tuple[str, str]]] = {s: [] for s in COMPONENTS.values()}
    syms = {s for s in hits if not s.startswith("test:")}
    for path in sorted(glob.glob(os.path.join(repo, "tests", "test_*.py"))):
        src = open(path).read()
        mod = os.path.splitext(os.path.basename(path))[0]
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef) and node.name.startswith("test_"):
                idents = set()
                for sub in ast.walk(node):
                    if isinstance(sub, ast.Name):
                        idents.add(sub.id)
                    elif isinstance(sub, ast.Attribute):
                        idents.add(sub.attr)
                    elif isinstance(sub, (ast.Import, ast.ImportFrom)):
                        for alias in sub.names:
                            idents.add(alias.name.split(".")[-1])
                            if alias.asname:
                                idents.add(alias.asname)
                for sym in hits:
                    if sym.startswith("test:"):
                        if node.name == sym[5:]:
                            hits[sym].append((mod, node.name))
                    elif sym in idents and sym in syms:
                        hits[sym].append((mod, node.name))
    return hits


def junit_results(xml_path: str) -> dict[tuple[str, str], str]:
    out: dict[tuple[str, str], str] = {}
    root = ET.parse(xml_path).getroot()
    for case in root.iter("testcase"):
        mod = case.get("classname", "").split(".")[-1]
        name = case.get("name", "").split("[")[0]
        status = "passed"
        if case.find("failure") is not None or case.find("error") is not None:
            status = "failed"
        elif case.find("skipped") is not None:
            status = "skipped"
        key = (mod, name)
        # a parametrized case fails the whole test if any param fails
        if out.get(key) != "failed":
            out[key] = status
    return out


def main() -> None:
    xml_path, out_path = sys.argv[1], sys.argv[2]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    by_symbol = collect_tests(repo)
    results = junit_results(xml_path)
    ledger = {}
    bad = []
    for cid, sym in COMPONENTS.items():
        tests = []
        ok = True
        for mod, name in by_symbol[sym]:
            status = results.get((mod, name), "not-run")
            tests.append({"test": f"tests/{mod}.py::{name}", "status": status})
            if status not in ("passed", "skipped"):
                ok = False
        if not tests:
            ok = False
        ledger[cid] = {
            "symbol": sym,
            "n_tests": len(tests),
            "all_passed": ok,
            "tests": tests,
        }
        if not ok:
            bad.append(cid)
    summary = {
        "components": len(COMPONENTS),
        "all_green": not bad,
        "failing_or_uncovered": bad,
        "ledger": ledger,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"{len(COMPONENTS)} T-kind components, "
        f"{'ALL GREEN' if not bad else 'PROBLEMS: ' + ','.join(bad)} -> {out_path}"
    )
    sys.exit(0 if not bad else 1)


if __name__ == "__main__":
    main()
