"""The 8 reference MR applications (``src/mrapps/``) as Python map/reduce
callables for the generic runner.

Crash/sleep side effects of the probe apps (crash.go, jobcount.go,
mtiming.go, rtiming.go) are *test-harness* behaviors, not data semantics:
in this engine the equivalents are the chaos/retry tests in
``tests/test_mr_runner.py`` and Spark task metrics. The data semantics of
every app are reproduced exactly.
"""

from __future__ import annotations

import re

# Reference tokenizer: split on runs of non-letters (unicode.IsLetter),
# src/mrapps/wc.go:23-26. ASCII corpus → [^a-zA-Z]+.
_WORD_RE = re.compile(r"[^a-zA-Z]+")


def _words(contents: str) -> list[str]:
    return [w for w in _WORD_RE.split(contents) if w]


# --- A1 wc (src/mrapps/wc.go:21-44) ---------------------------------------
def wc_map(name: str, contents: str) -> list[tuple[str, str]]:
    return [(w, "1") for w in _words(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- A2 indexer (src/mrapps/indexer.go:20-39) ------------------------------
def indexer_map(name: str, contents: str) -> list[tuple[str, str]]:
    return [(w, name) for w in sorted(set(_words(contents)))]


def indexer_reduce(key: str, values: list[str]) -> str:
    # doc-frequency + sorted comma-joined doc list (indexer.go:36-39)
    return f"{len(values)} {','.join(sorted(values))}"


# --- A3/A4 crash / nocrash data semantics (src/mrapps/crash.go:34-55) ------
def crash_map(name: str, contents: str) -> list[tuple[str, str]]:
    return [
        ("a", name),
        ("b", str(len(name))),
        ("c", str(len(contents))),
        ("d", "xyzzy"),
    ]


def crash_reduce(key: str, values: list[str]) -> str:
    # values order is nondeterministic in the reference too; it sorts here
    # (crash.go:48-52)
    return " ".join(sorted(values))


# --- A5 jobcount data part (src/mrapps/jobcount.go:22-46) -------------------
def jobcount_map(name: str, contents: str) -> list[tuple[str, str]]:
    return [("a", "x")]


def jobcount_reduce(key: str, values: list[str]) -> str:
    # the reference counts marker files (map invocations); the data part is
    # simply the number of emitted records = number of map calls
    return str(len(values))


# --- A6 early_exit (src/mrapps/early_exit.go:21-40) -------------------------
def early_exit_map(name: str, contents: str) -> list[tuple[str, str]]:
    return [(name, "1")]


def early_exit_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


# --- A7/A8 mtiming / rtiming (src/mrapps/{m,r}timing.go) --------------------
# Pure scheduler probes (concurrent-worker detection via pid marker files).
# Their Spark analog is executor/task concurrency, asserted from Spark task
# metrics in tests — there is no data transformation to reproduce beyond
# "emit fixed keys, sort values", which crash_map/crash_reduce already cover.
def rtiming_map(name: str, contents: str) -> list[tuple[str, str]]:
    return [(chr(ord("a") + i), "1") for i in range(10)]  # rtiming.go:62-76


def rtiming_reduce(key: str, values: list[str]) -> str:
    return str(len(values))


APPS: dict[str, tuple] = {
    "wc": (wc_map, wc_reduce),
    "indexer": (indexer_map, indexer_reduce),
    "crash": (crash_map, crash_reduce),
    "nocrash": (crash_map, crash_reduce),
    "jobcount": (jobcount_map, jobcount_reduce),
    "early_exit": (early_exit_map, early_exit_reduce),
    "rtiming": (rtiming_map, rtiming_reduce),
}
