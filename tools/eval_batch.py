#!/usr/bin/env python3
"""Run a batch of evaluate_samples variants in ONE process.

Each eval variant as its own subprocess pays the full backend/client
startup (minutes on a tunnel-attached device) 16 times over; this runner
amortizes it once, and shares the real set's decoded features across
variants via evaluate_samples' real_cache hook — the real side is read and
featurized exactly once per (path, cap, size, features) key.

Plan file: JSON list of {"name": str, "args": [evaluate_samples argv]}.
Per-variant wall seconds stream into --timings-out after every variant, so
an interrupted batch still reports what it finished. A failing variant is
recorded ("error" entry) and the batch continues; the exit code is the
number of failures.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runnable as `python tools/eval_batch.py` from the repo root: the script
# dir (tools/) is sys.path[0], so the package needs the root added.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", required=True,
                    help='JSON: [{"name": ..., "args": [...]}, ...]')
    ap.add_argument("--timings-out", default=None,
                    help="JSON path for per-variant wall seconds "
                         "(updated after every variant)")
    a = ap.parse_args()
    with open(a.plan) as f:
        plan = json.load(f)

    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    log = lambda *x, **k: print(*x, file=sys.stderr, **k)
    real_cache: dict = {}
    times: dict = {}
    failures = 0
    for item in plan:
        name = item["name"]
        print(f"[eval_batch] {name}", flush=True)
        t0 = time.time()
        try:
            evaluate_samples(item["args"], log=log, real_cache=real_cache)
        except BaseException as e:  # noqa: BLE001 — record, keep batching
            if isinstance(e, KeyboardInterrupt):
                raise
            failures += 1
            times[f"{name}.error"] = repr(e)[:300]
            log(f"[eval_batch] {name} FAILED: {e!r}")
        times[name] = round(time.time() - t0, 1)
        if a.timings_out:
            with open(a.timings_out, "w") as f:
                json.dump(times, f, indent=1, sort_keys=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
