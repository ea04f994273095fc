"""Two-parallelism scaling run (north rule evidence in this sandbox):
the same KG pipeline job at local[8] and local[32] on identical input;
reports throughput at both and efficiency = T(32) / (4 × T(8)).

Run: python scripts/bench_scaling.py [n_docs]  → one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from corenlp_spark.session import get_spark
from corenlp_spark.data.synth import synth_docs
from corenlp_spark.operators.graph import dedup_triples
from corenlp_spark.plans.pipeline import annotate, triples_of

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
# warm the JVM/UDF path once so the measured run is steady-state
dedup_triples(triples_of(annotate(synth_docs(spark, 200, parts=cores), upto="coref"))).count()
t0 = time.time()
docs = synth_docs(spark, n_docs, parts=cores * 2)
n = dedup_triples(triples_of(annotate(docs, upto="coref"))).count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "wall_s": round(wall, 2),
                  "n_triples": n, "docs_per_sec": round(n_docs / wall, 1)}))
"""


def run(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    r8 = run(8, n_docs)
    r32 = run(32, n_docs)
    eff = (r32["docs_per_sec"] / (4 * r8["docs_per_sec"])) if r8["docs_per_sec"] else 0
    print(json.dumps({
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "gate": ">=0.8",
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
