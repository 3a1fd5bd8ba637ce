"""Big-corpus crawl-to-exhaustion headline (round 5).

The §3c end-to-end number was last taken at a 400k-page corpus, where the
~10s/round fixed cost (DAG build + stats + checkpoint, see BENCH/BASELINE.md
§3) floors the wall clock at ~100s for ~7 rounds and caps the headline at
~4k URLs/s regardless of kernel speed. §3b proved the kernel regime: one
round at a 1.6M wave pushes 25.6k URLs/s. This script measures the SAME
crawl-to-exhaustion job as scripts/scaling_bench.py at a corpus size where
the waves sit in that kernel-dominant regime (default 4M pages, the size
already proven to fit this box by BENCH/scaling_biround_4m.json), so the
end-to-end headline reflects the engine rather than the small-round floor.

Writes BENCH/scaling_e2e_big.json. Run:
    python scripts/e2e_big.py [total] [cores_csv]
e.g. python scripts/e2e_big.py 4000000 32,8
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from scaling_bench import RUNNER  # noqa: E402


def run_at(cores: int, total: int, timeout: int = 5400) -> dict:
    code = RUNNER.format(repo=str(REPO), cores=cores, total=total)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no result line; stderr tail: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores_list = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "32,8").split(",")]
    raw = Path(REPO / "BENCH" / "scaling_e2e_big.json")
    runs: list[dict] = []
    if raw.exists():  # accumulate across invocations (interleaved sessions)
        runs = json.loads(raw.read_text()).get("runs", [])
    for c in cores_list:
        print(f"crawl-to-exhaustion total={total} at local[{c}]...", flush=True)
        r = run_at(c, total)
        r["measured"] = time.strftime("%Y-%m-%d %H:%M:%S")
        r["total"] = total
        print(f"local[{c}]:", r, flush=True)
        runs.append(r)
        by_core: dict[int, list[dict]] = {}
        for x in runs:
            by_core.setdefault(x["cores"], []).append(x)
        best = {c2: min(v, key=lambda r2: r2["sec"]) for c2, v in by_core.items()}
        summary = {"total": total, "runs": runs, "best": best}
        if 8 in best and 32 in best:
            sp = best[8]["sec"] / best[32]["sec"]
            summary["speedup_best"] = round(sp, 3)
            summary["efficiency_best"] = round(sp / 4.0, 3)
        raw.write_text(json.dumps(summary, indent=1))
        print(json.dumps(summary["best"], indent=1), flush=True)


if __name__ == "__main__":
    main()
