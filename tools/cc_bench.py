"""Connected-components scaling evidence: the same edge set contracted
at two parallelism levels (cold JVM each, same methodology as
tools/scaling_bench.py — tmpfs shuffle dirs, full-size warm-up run,
min-of-2 reporting).

The edge generator is deterministic and mixes the three shapes that
stress the algorithm differently: short chains (many small
components), intra-block stars (hub contraction), and long-range
links every ~10k ids (big sparse components that force multi-round
convergence).

Usage: python tools/cc_bench.py [n_nodes] [cores_a] [cores_b]
Defaults: 4_000_000 2 8.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ics_search_engine_spark.session import get_spark
from ics_search_engine_spark.operators.components import connected_components
import pyspark.sql.functions as F

cores = int(sys.argv[1]); n = int(sys.argv[2])
os.makedirs("/dev/shm/spark-local", exist_ok=True)
spark = get_spark(
    app_name=f"ccbench-{{cores}}", master=f"local[{{cores}}]",
    shuffle_partitions=max(8, 4 * cores),
    extra_conf={{"spark.local.dir": "/dev/shm/spark-local"}},
)
spark.sparkContext.setLogLevel("ERROR")

ids = spark.range(n).select(F.col("id"))
chains = ids.filter("id % 8 < 5 AND id + 1 < {{n}}".format(n=n)).select(
    F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
stars = ids.filter("id % 8 = 6").select(
    F.col("id").alias("src"),
    ((F.col("id") / 64).cast("long") * 64).alias("dst"))
longl = ids.filter("id % 8 = 7").select(
    F.col("id").alias("src"), (F.col("id") % 9973).alias("dst"))
edges = chains.unionByName(stars).unionByName(longl)
edges = edges.repartition(max(8, 4 * cores)).persist()
n_edges = edges.count()

def run():
    st = {{}}
    t0 = time.time()
    cc = connected_components(edges, stats=st)
    n_comp = cc.select("root").distinct().count()
    return time.time() - t0, st, n_comp

run()  # full-size warm-up (JIT; see scaling_bench.py rationale)
best = None
for _ in range(2):
    dt, st, n_comp = run()
    if best is None or dt < best[0]:
        best = (dt, st, n_comp)
dt, st, n_comp = best
print(json.dumps({{
    "cores": cores, "n_nodes": n, "n_edges": n_edges,
    "wall_s": round(dt, 2), "edges_per_s": round(n_edges / dt),
    "rounds": st.get("rounds"), "n_components": n_comp,
}}))
"""


def run_worker(cores: int, n_nodes: int) -> dict:
    code = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_nodes)],
        capture_output=True, text=True, check=False,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"worker {cores} failed:\n{out.stderr[-3000:]}")
    return json.loads(line[-1])


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    ca = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cb = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    a = run_worker(ca, n_nodes)
    b = run_worker(cb, n_nodes)
    eff = (b["edges_per_s"] / a["edges_per_s"]) / (cb / ca)
    print(json.dumps({
        "metric": "connected-components contraction throughput",
        "n_nodes": n_nodes,
        "runs": [a, b],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
