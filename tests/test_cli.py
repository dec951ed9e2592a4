"""CLI-parity entry point tests (pure core, no Spark)."""

import json
import subprocess
import sys

import pytest

from tests.fixtures import SIMPLE_HTML


@pytest.fixture()
def html_file(tmp_path):
    path = tmp_path / "page.html"
    path.write_text(SIMPLE_HTML)
    return str(path)


def run_cli(argv, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "sift_spark.cli", *argv],
        capture_output=True, text=True, input=stdin, cwd="/root/repo",
    )


def test_basic_extraction(html_file):
    proc = run_cli([html_file, "-q"])
    assert proc.returncode == 0
    assert "Main Article Title" in proc.stdout
    assert "Site Header" not in proc.stdout


def test_word_limit(html_file):
    proc = run_cli([html_file, "-w", "10", "-q"])
    assert proc.returncode == 0
    assert len(proc.stdout.split()) <= 10


def test_selector(html_file):
    proc = run_cli([html_file, "-s", "article", "-q"])
    assert proc.returncode == 0
    assert "Main Article Title" in proc.stdout


def test_selector_error(html_file):
    proc = run_cli([html_file, "-s", ".missing"])
    assert proc.returncode == 1
    assert "no content extracted" in proc.stderr


def test_stdin():
    proc = run_cli(["-q"], stdin=SIMPLE_HTML)
    assert proc.returncode == 0
    assert "Main Article Title" in proc.stdout


def test_search(html_file):
    proc = run_cli([html_file, "--search", "important information", "-q"])
    assert proc.returncode == 0
    assert "important information" in proc.stdout


def test_multi_source_skips_failures(html_file, tmp_path):
    proc = run_cli([html_file, str(tmp_path / "missing.html")])
    assert proc.returncode == 0
    assert "Warning: failed to process source" in proc.stderr
    assert "Main Article Title" in proc.stdout


def test_format_flags_accepted_but_nonfunctional(html_file):
    """Reference parity: the --md/--text/--json flags are parsed but
    never consumed (cfg.OutputFormat is dead in cmd/sift/main.go) --
    output is always the plain result text, and the flags are mutually
    exclusive like the reference's MarkFlagsMutuallyExclusive set."""
    plain = run_cli([html_file, "-q"])
    for flag in ("--json", "--md", "--text"):
        proc = run_cli([html_file, flag, "-q"])
        assert proc.returncode == 0
        assert proc.stdout == plain.stdout
    both = run_cli([html_file, "--json", "--md", "-q"])
    assert both.returncode != 0


def test_limit_flags_mutually_exclusive(html_file):
    proc = run_cli([html_file, "-w", "100", "-c", "500"])
    assert proc.returncode != 0
    proc2 = run_cli([html_file, "--middle", "--end"])
    assert proc2.returncode != 0


def test_matches_core_bytes(html_file):
    from sift_spark.core.counters import WORDS
    from sift_spark.core.pipeline import SiftParams, run_sift

    proc = run_cli([html_file, "-w", "25", "-q"])
    expected, error = run_sift(
        SIMPLE_HTML, SiftParams(counting_method=WORDS, max_units=25)
    )
    assert error is None
    assert proc.stdout == expected


def test_token_mode_warns_about_fallback(html_file):
    """Default mode is tokens/2500 (main.go:52-55); without the real
    cl100k vocab the CLI must tell the user budgets come from the
    deterministic fallback tokenizer."""
    proc = run_cli([html_file])  # default: token counting
    assert proc.returncode == 0
    assert "deterministic fallback tokenizer" in proc.stderr
    assert "SIFT_SPARK_CL100K_PATH" in proc.stderr

    # word mode must NOT warn
    proc_w = run_cli([html_file, "-w", "50", "-q"])
    assert "fallback tokenizer" not in proc_w.stderr


def test_dist_zip_matches_source():
    """The spark-submit artifact must never drift from source (the
    round-4 third review caught a stale css.py in the zip): every
    tracked sift_spark/*.py must be present byte-identical. Rebuild
    with `sh scripts/package.sh` after any module change."""
    import os
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(repo, "dist", "sift_spark.zip")
    assert os.path.exists(zip_path), "run sh scripts/package.sh"
    with zipfile.ZipFile(zip_path) as zf:
        zipped = set(zf.namelist())
        for root, _dirs, files in os.walk(os.path.join(repo, "sift_spark")):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                path = os.path.join(root, name)
                rel = os.path.relpath(path, repo)
                assert rel in zipped, f"{rel} missing from dist zip"
                with open(path, "rb") as fh:
                    assert zf.read(rel) == fh.read(), (
                        f"{rel} is stale in dist zip -- "
                        "run sh scripts/package.sh"
                    )
