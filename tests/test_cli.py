"""CLI parity test — the test-mr.sh methodology end-to-end through the
command line: distributed output must equal sequential (golden) output."""

from __future__ import annotations

import os
import subprocess
import sys


def _write_corpus(tmp_path):
    texts = {
        "a.txt": "the quick brown fox jumps over the lazy dog",
        "b.txt": "pack my box with five dozen liquor jugs the fox",
        "c.txt": "the dog and the fox met a dog",
    }
    src = tmp_path / "corpus"
    src.mkdir()
    for name, text in texts.items():
        (src / name).write_text(text)
    return src


def test_cli_distributed_matches_sequential(tmp_path):
    src = _write_corpus(tmp_path)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}

    seq_out = tmp_path / "seq"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "mapreduce_framework_spark.cli",
            "wc",
            f"{src}/*.txt",
            str(seq_out),
            "--sequential",
        ],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    golden = sorted((seq_out / "mr-out-0").read_text().splitlines())

    dist_out = tmp_path / "dist"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "mapreduce_framework_spark.cli",
            "wc",
            f"{src}/*.txt",
            str(dist_out),
            "--n-reduce",
            "5",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]

    import glob as _glob

    lines = []
    for path in _glob.glob(str(dist_out / "bucket=*" / "part-*")):
        with open(path, encoding="utf-8") as fh:
            lines.extend(ln.rstrip("\n") for ln in fh if ln)

    # distributed map keys are full paths (reference passes filenames too);
    # wc emits only words so outputs compare directly
    assert sorted(lines) == golden
    assert len([d for d in os.listdir(dist_out) if d.startswith("bucket=")]) >= 1


def test_cli_rejects_unknown_app(tmp_path):
    src = _write_corpus(tmp_path)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "mapreduce_framework_spark.cli",
            "nope",
            f"{src}/*.txt",
            str(tmp_path / "o"),
        ],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert proc.returncode == 2
    assert "unknown app" in proc.stderr


def test_cli_indexer_name_parity(tmp_path):
    """indexer embeds the input *name* in its output (doc lists), so this
    pins distributed-vs-sequential filename agreement (basename, not URI)."""
    src = _write_corpus(tmp_path)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}

    def run(extra, out):
        return subprocess.run(
            [
                sys.executable,
                "-m",
                "mapreduce_framework_spark.cli",
                "indexer",
                f"{src}/*.txt",
                str(out),
                *extra,
            ],
            capture_output=True,
            text=True,
            timeout=300,
            cwd="/root/repo",
            env=env,
        )

    seq_out = tmp_path / "seq_idx"
    assert run(["--sequential"], seq_out).returncode == 0
    golden = sorted((seq_out / "mr-out-0").read_text().splitlines())

    dist_out = tmp_path / "dist_idx"
    proc = run([], dist_out)
    assert proc.returncode == 0, proc.stderr[-1500:]

    import glob as _glob

    lines = []
    for path in _glob.glob(str(dist_out / "bucket=*" / "part-*")):
        with open(path, encoding="utf-8") as fh:
            lines.extend(ln.rstrip("\n") for ln in fh if ln)
    assert sorted(lines) == golden
    assert any("a.txt" in ln for ln in lines)  # names are basenames
