"""Two-parallelism scaling evidence (BASELINE.md protocol): run bench.py at
local[8] and local[32] on identical input; efficiency = (T32/T8)/4 where T
is docs/sec. Writes BENCH/BASELINE.md and prints the summary JSON.

Usage: python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_docs: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_DOCS=str(n_docs),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    r8 = run_bench(8, n_docs, sf_dir)
    r32 = run_bench(32, n_docs, sf_dir)
    t8, t32 = r8["value"], r32["value"]
    eff = (t32 / t8) / 4.0

    summary = {
        "docs_per_sec_local8": t8,
        "docs_per_sec_local32": t32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": ">= 0.8",
        "n_docs": n_docs,
        "sf_dir": sf_dir,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured throughput + scaling evidence

Protocol (BASELINE.md): identical job binary and input at two local
parallelism levels (sandbox proxy for N vs 4N executors). Flagship =
interleaved docs -> elements -> z12/z14 tile assignment + typed-overlap
spatial self-join over {n_docs} synthetic documents (seed=42); shuffle
partitions scale with cores; AQE on.

| config | flagship docs/sec | flagship wall (s) |
|---|---|---|
| local[8]  | {t8} | {r8['queries']['flagship_tile_join']} |
| local[32] | {t32} | {r32['queries']['flagship_tile_join']} |

**Scaling efficiency (T32/T8)/4 = {eff:.3f}** (target >= 0.8)

Per-query seconds at local[32] (sf dir {sf_dir}):

```json
{json.dumps(r32['queries'], indent=2)}
```

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
