"""Report collation (tools/report_md.py) — the analog of the
reference's results-JSON -> markdown leaderboard step
(/root/reference/scripts/report2markdown.py:18-60), driven on fixture
artifacts so the table shapes are pinned."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import report_md


def _fixture_repo(tmp_path):
    wh = tmp_path / ".data" / "warehouse"
    wh.mkdir(parents=True)
    with open(wh / "_manifest.jsonl", "w") as f:
        f.write(json.dumps({
            "stage": "route", "sink": "routed", "status": "committed",
            "row_count": 1000, "wall_ms": 123,
            "partition_lineage": {"0/user": 400, "1/tool": 600},
        }) + "\n")
        f.write(json.dumps({
            "stage": "labels", "sink": "labels", "status": "committed",
            "row_count": 10, "wall_ms": 5, "partition_lineage": None,
        }) + "\n")
    with open(tmp_path / "CORRECTNESS_r07.json", "w") as f:
        json.dump({
            "good_q": {"rows_match": True, "schema_match": True,
                       "hash_match": True, "spark_rows": 5,
                       "oracle_rows": 5, "err": None},
            "rows_only_q": {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": 7,
                            "oracle_rows": None, "err": "no_oracle"},
            "bad_q": {"rows_match": False, "schema_match": True,
                      "hash_match": False, "spark_rows": 3,
                      "oracle_rows": 4, "err": None},
        }, f)
    with open(tmp_path / "BENCH_r07.json", "w") as f:
        json.dump({
            "metric": "m", "value": 1.5, "unit": "sec",
            "queries": {"e2e_pipeline": 1.5}, "sf": 0.01, "turns": 100,
            "turns_per_sec": 66.7, "cores": "8",
            "docs": {"ann_recall_at_10": 0.9},
            "streaming": {"exactly_once_pass": True},
        }, f)
    (tmp_path / "BENCH").mkdir()
    with open(tmp_path / "BENCH" / "scaling.json", "w") as f:
        json.dump({
            "efficiency": 0.91,
            "lo": {"turns_per_sec": 100.0, "cores": "local-cluster[1,2]"},
            "hi": {"turns_per_sec": 364.0, "cores": "local-cluster[4,2]"},
        }, f)
    return tmp_path


def test_report_collates_all_sections(tmp_path):
    repo = _fixture_repo(tmp_path)
    report = report_md.build_report(str(repo))
    # manifest table with lineage summary
    assert "| route | routed | committed | 1000 | 123 | 2 partitions |" in report
    assert "| labels | labels | committed | 10 | 5 | — |" in report
    # correctness: counts + per-status rows, failures loud
    assert "**1 green / 1 rows-only / 1 failed** of 3 checked" in report
    assert "| bad_q | **FAIL** | 3 | 4 |" in report
    assert "| rows_only_q | rows-only | 7 | None | no_oracle |" in report
    # bench headline + sections
    assert "**66.7 turns/s**" in report
    assert "| e2e_pipeline | 1.5 |" in report
    assert "| ann_recall_at_10 | 0.9 |" in report
    assert "| exactly_once_pass | True |" in report
    # scaling lines (weak_scaling.json absent -> graceful note)
    assert "**strong scaling: 0.91**" in report
    assert "no weak_scaling.json yet" in report


def test_report_degrades_gracefully_on_empty_repo(tmp_path):
    report = report_md.build_report(str(tmp_path))
    assert "no manifest found" in report
    assert "no CORRECTNESS_r*.json yet" in report
    assert "no BENCH_r*.json yet" in report


def test_report_writes_file_on_real_repo(tmp_path):
    """The tool must run end-to-end on THIS repo's real artifacts."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "RUN_REPORT.md")
    sys.argv = ["report_md.py", repo, "-o", out]
    report_md.main()
    text = open(out).read()
    assert "# Run report" in text and "## Scaling efficiency" in text


def test_check_mode_flags_stale_and_passes_fresh(tmp_path):
    repo = _fixture_repo(tmp_path)
    out = str(repo / "RUN_REPORT.md")
    assert report_md.check_fresh(str(repo), out)  # missing -> stale
    with open(out, "w") as f:
        f.write(report_md.build_report(str(repo)))
    assert report_md.check_fresh(str(repo), out) is None
    # a newer round's artifact lands -> the old report is stale again
    with open(repo / "CORRECTNESS_r08.json", "w") as f:
        json.dump({}, f)
    assert "stale" in report_md.check_fresh(str(repo), out)


def test_repo_run_report_is_fresh():
    """The committed RUN_REPORT.md must collate the NEWEST correctness
    and bench artifacts — a stale report (VERDICT r3 'what's missing'
    #4) now fails the suite instead of shipping silently. Fix: run
    `python tools/report_md.py`."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    msg = report_md.check_fresh(repo, os.path.join(repo, "RUN_REPORT.md"))
    assert msg is None, msg


def test_untracked_scratch_artifact_does_not_stale_report(tmp_path):
    """ADVICE r4: a scratch CORRECTNESS/BENCH json dropped in the repo
    root (untracked) must not flip the freshness check — only
    git-tracked artifacts define the staleness contract."""
    import os
    import subprocess

    from report_md import check_fresh

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert check_fresh(repo, os.path.join(repo, "RUN_REPORT.md")) is None
    scratch = os.path.join(repo, "CORRECTNESS_r98.json")
    try:
        with open(scratch, "w") as f:
            f.write("{}")
        # still fresh: the scratch file is not git-tracked
        assert check_fresh(repo, os.path.join(repo, "RUN_REPORT.md")) is None
    finally:
        os.remove(scratch)
    # sanity: the file really was untracked during the check
    out = subprocess.run(["git", "-C", repo, "ls-files", "CORRECTNESS_r98.json"],
                         capture_output=True, text=True)
    assert out.stdout.strip() == ""
