"""Best-of-3 bench protocol (r11 verdict #1).

Two committed rounds of driver bench records were host-contended, and
r11 proved the shared box silently degrades identical code by up to 35%
(SCALE.md:1538). The defense when the host never goes quiet: run the
full bench THREE times on the same tree, keep every run's summary, and
select the MINIMUM-headline run — host contention only ever ADDS time,
so the minimum is the least-polluted estimate of the tree's true cost.
The protocol is valid when the selected run has stalled_samples == 0
(no mid-run hypervisor stalls polluted even the winner); the record
says so either way.

Writes bench_best_of_3.json at the repo root; bench.py embeds its
"summary" block into every subsequent bench record (driver-visible),
keyed to the same sf.

Usage:
  python tools/bench3.py                      # execute 3 sequential runs
  python tools/bench3.py out1 out2 [out3...]  # assemble from saved
                                              # bench stdout files
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _summary_from_stdout(text: str) -> dict:
    # bench.py prints the FULL record first, then the compact line; both
    # are JSON lines — take the first parseable one (full detail).
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric", "").startswith("headline_queries"):
            return {
                "value": d["value"],
                "full_registry_rest_sec": d.get("full_registry_rest_sec"),
                "n_failed": d.get("n_failed", len(
                    [v for v in d.get("queries", {}).values() if v < 0]
                )),
                "host_load": d.get("host_load"),
                "sf": d.get("sf"),
                # retained so the SELECTED run's per-query rows and
                # per-gate replay costs are auditable (r13 verdict #2:
                # the minimum run carried no per-query map, so a 2.4x
                # single-query jump could not be ruled host noise)
                "queries": d.get("queries"),
                "streaming_replay_sec": d.get("streaming_replay_sec"),
                # ingest/lookup micro-bench rows ride the same protocol
                # (r13 verdict #5: the committed live-run rows spread
                # 8.5x on host noise alone)
                "ingest": d.get("ingest"),
            }
    raise ValueError("no bench JSON line found")


def _head_commit() -> str | None:
    try:
        r = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=ROOT,
        )
        return r.stdout.strip() or None
    except OSError:
        return None


def main() -> int:
    runs: list[dict] = []
    args = sys.argv[1:]
    n_new = 3
    if args and args[0] == "--extend":
        # Same-TREE extension (r12 verdict #2 lesson: a protocol record
        # must match the shipped tree): reuse the existing record's runs
        # and execute N more full benches, refusing if HEAD moved since
        # the record was taken — every run stays honestly recorded, and
        # a later quiet-host window can still land the 0-stall minimum.
        n_new = int(args[1]) if len(args) > 1 else 1
        with open(os.path.join(ROOT, "bench_best_of_3.json")) as fh:
            prev = json.load(fh)
        prev_commit = prev.get("commit")
        if not prev_commit:
            # A record that predates the commit field has unknown
            # provenance — extending it could blend stale runs from a
            # different tree into the protocol record (ADVICE r13).
            raise SystemExit(
                "bench_best_of_3.json carries no commit field, so its "
                "tree is unknown; run the full protocol (no --extend) "
                "to establish provenance"
            )
        if _head_commit() and prev_commit != _head_commit():
            raise SystemExit(
                "bench_best_of_3.json was recorded on a different tree "
                f"({prev_commit[:12]}); re-run the full protocol instead"
            )
        prev_summary = prev.get("summary", {})
        runs.extend(
            {
                **r,
                "sf": prev["sf"],
                # the prior record keeps per-query maps only for its
                # minimum run — reattach so a still-winning old minimum
                # keeps its audit trail through the extension (a non-min
                # old run can never become the minimum later)
                **(
                    {
                        "queries": prev_summary.get("min_queries"),
                        "streaming_replay_sec": prev_summary.get(
                            "min_streaming_replay_sec"
                        ),
                        "ingest": prev_summary.get("min_ingest"),
                    }
                    if r.get("source") == prev_summary.get("min_source")
                    else {}
                ),
            }
            for r in prev["runs"]
        )
        args = []
    if args:
        for p in args:
            with open(p) as fh:
                s = _summary_from_stdout(fh.read())
            s["source"] = os.path.basename(p)
            runs.append(s)
    else:
        base = len(runs)
        for i in range(base, base + n_new):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                capture_output=True, text=True, cwd=ROOT,
            )
            if r.returncode != 0:
                print(r.stderr[-2000:], file=sys.stderr)
                return 1
            s = _summary_from_stdout(r.stdout)
            s["source"] = f"run{i + 1}"
            runs.append(s)
            print(
                f"# run {i + 1}: {s['value']} s "
                f"(stalled {s['host_load']['stalled_samples']}, "
                f"{time.time() - t0:.0f} s wall)",
                file=sys.stderr,
            )
    if len({s["sf"] for s in runs}) != 1:
        raise ValueError("runs span multiple scale factors")
    # The protocol (and every verdict that endorsed it) is "minimum with
    # stalled_samples == 0": a mid-run hypervisor stall both ADDS time to
    # some samples and (by stalling the clock source) can deflate others,
    # so a stalled run is not a cleaner estimate even when its total is
    # lower. Select the minimum among stall-free runs when one exists —
    # which can REJECT a lower-but-stalled total (r15: 55.51 s with 2
    # stalls lost to 57.05 s with 0) — and fall back to the absolute
    # minimum (flagged invalid) only when every run stalled. Every run's
    # value stays in all_values either way.
    clean = [
        s
        for s in runs
        if (s.get("host_load") or {}).get("stalled_samples") == 0
    ]
    best = min(clean or runs, key=lambda s: s["value"])
    rec = {
        "commit": _head_commit(),
        "protocol": (
            "min of N full bench runs on one tree; contention only adds "
            "time, so the minimum is the least-polluted estimate. Valid "
            "when the selected run has stalled_samples == 0."
        ),
        "sf": best["sf"],
        "n_runs": len(runs),
        "runs": [
            {k: s[k] for k in ("source", "value", "host_load")} for s in runs
        ],
        # host_load is populated via .get, so a record missing the
        # instrumentation is representable (None) — treat it as an
        # INVALID protocol run instead of crashing assembly (ADVICE r12)
        "summary": {
            "min_value": best["value"],
            "min_source": best["source"],
            "min_stalled_samples": (best.get("host_load") or {}).get(
                "stalled_samples"
            ),
            "min_host_verdict": (best.get("host_load") or {}).get("verdict"),
            "all_values": sorted(s["value"] for s in runs),
            "valid": (best.get("host_load") or {}).get("stalled_samples") == 0,
            # full audit trail of the SELECTED run (r13 verdict #2)
            "min_queries": best.get("queries"),
            "min_streaming_replay_sec": best.get("streaming_replay_sec"),
            "min_ingest": best.get("ingest"),
        },
    }
    out = os.path.join(ROOT, "bench_best_of_3.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec["summary"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
