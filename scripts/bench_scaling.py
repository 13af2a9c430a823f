"""Two-parallelism scaling measurement (north-rule evidence).

A real N vs 4N executor comparison needs a cluster; the sandbox proxy
(per driver instruction) is the same job at local[8] vs local[32] on the
same input.  Prints throughput at both and the scaling efficiency
eff = (T_8 / T_32) / 4, and appends a results block to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_once(cores: int, sf_dir: str) -> dict:
    """Run the pipeline benchmark in a fresh process (clean JVM)."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench failed at cores={cores}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    r_lo = run_once(lo, sf_dir)
    r_hi = run_once(hi, sf_dir)
    t_lo = r_lo["pipeline_sec"]
    t_hi = r_hi["pipeline_sec"]
    tot_lo, tot_hi = r_lo["value"], r_hi["value"]
    eff_pipeline = (t_lo / t_hi) / (hi / lo)
    eff_total = (tot_lo / tot_hi) / (hi / lo)
    result = {
        "sf_dir": sf_dir,
        "cores_lo": lo,
        "cores_hi": hi,
        "pipeline_sec_lo": t_lo,
        "pipeline_sec_hi": t_hi,
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "scaling_efficiency_pipeline": round(eff_pipeline, 3),
        "headline_total_lo": tot_lo,
        "headline_total_hi": tot_hi,
        "scaling_efficiency_total": round(eff_total, 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result, indent=2))
    with open("SCALING.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
