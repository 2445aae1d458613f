#!/usr/bin/env python
"""Batched scale-rehearsal runner (SURVEY §6 discipline, r6 verdict item 4).

Runs the full oracle-parity suite at a scale-rehearsal SF in BATCHES, each in
a FRESH pytest process (fresh JVM): one executor heap OOM poisons a shared
local JVM and every later entry fails with py4j connection errors, so batch
isolation is what makes a sweep's failures attributable. Entries that fail
inside a batch are automatically re-run ALONE in their own fresh session
before being recorded as real failures (the JVM-poisoning replay rule).

Usage:
    python tools/run_rehearsal.py /tmp/sf3 [batch_size] [out.json] [only,...]

Results stream to the JSON log after every batch, so a killed sweep keeps
its partial tally.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH_TIMEOUT = 5400  # seconds; generous — a wedged JVM should not stall the sweep forever


def _run(ids: list[str], env: dict) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "--no-header", *ids],
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
    out_path = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/rehearsal_{tag}.json"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    names = sorted(e.queries())
    if only:
        unknown = only - set(names)
        if unknown:
            print(f"unknown entries: {sorted(unknown)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in only]

    env = dict(os.environ, ORACLE_PARITY_SF=sf_dir)
    results: dict = {"sf_dir": sf_dir, "batches": {}, "failed": [], "passed": 0}
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
            rc, out = -9, (ex.stdout or "") + "\n<batch timeout>"
        dt = round(time.monotonic() - t0, 1)
        failed = re.findall(r"FAILED [^\[]*\[([^\]]+)\]", out)
        if rc != 0 and not failed:
            failed = list(batch)  # crashed before reporting — replay all
        retried_ok, real_fail = [], []
        for name in failed:
            # JVM-poisoning replay: alone, in a fresh session
            try:
                rp = _run(
                    [f"tests/test_oracle_parity.py::test_oracle_parity[{name}]"],
                    env,
                )
                (retried_ok if rp.returncode == 0 else real_fail).append(name)
                if rp.returncode != 0:
                    results.setdefault("fail_tails", {})[name] = rp.stdout[-3000:]
            except subprocess.TimeoutExpired:
                real_fail.append(name)
                results.setdefault("fail_tails", {})[name] = "<solo timeout>"
        n_ok = len(batch) - len(real_fail)
        results["passed"] += n_ok
        results["failed"].extend(real_fail)
        results["batches"][f"b{i // batch_size:02d}"] = {
            "entries": batch,
            "sec": dt,
            "ok": rc == 0,
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
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print(
        f"done: {results['passed']}/{len(names)} green in "
        f"{results['total_sec']}s -> {out_path}",
        flush=True,
    )
    return 1 if results["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
