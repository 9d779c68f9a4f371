"""Scaling-efficiency measurement: region-sharded discovery at N processes.

BASELINE.md target: >=80% scaling efficiency at 2 hosts.  Real multi-host TPU
slices aren't reachable from this environment (one chip through a relay), so
this measures the production multi-process path itself —
`parallel.discovery.discover_variants_distributed` under jax.distributed with
gloo collectives — on the CPU backend with each process pinned to a disjoint
core set (the per-host resource stand-in).  Efficiency = T1 / (N * TN) with
identical total work (the golden E. coli genome), warm-compile timing only.

Usage: python scripts/scaling_bench.py [N] [--cores-per-proc C]
Writes SCALING.json at the repo root and prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, json
pid, nproc, coord, cores = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
os.sched_setaffinity(0, {int(c) for c in cores.split(",")})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.environ["BGT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from biograph_tpu.io.fastq import read_fastq
from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.build.readmap_build import build_readmap
from biograph_tpu.index.reference import Reference
from biograph_tpu.variants.discover import DiscoverOptions, discover_variants
from biograph_tpu.parallel.discovery import discover_variants_distributed
from biograph_tpu.parallel.distributed import initialize

if nproc > 1:
    initialize(coordinator=coord, num_processes=nproc, process_id=pid)

batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
ref = Reference.from_reference_dir(
    "/root/reference/datasets/reference/e_coli_k12_ASM584v1")
ss = build_seqset(batch.codes, batch.lengths)
rm = build_readmap(ss, batch.codes, batch.lengths)
opt = DiscoverOptions(min_alt_support=5)
run_dir = os.environ["BGT_SCALE_DIR"] + "/warm"
recs = discover_variants_distributed(ss, ref, run_dir, opt=opt, readmap=rm)
t0 = time.time()
run_dir = os.environ["BGT_SCALE_DIR"] + "/timed"
recs = discover_variants_distributed(ss, ref, run_dir, opt=opt, readmap=rm)
dt = time.time() - t0
print("LEG", json.dumps({"pid": pid, "call_s": round(dt, 2),
                         "records": len(recs)}), flush=True)
"""


def run_leg(nproc: int, cores_per_proc: int, scale_dir: str):
    port = 12421 + nproc
    env = dict(os.environ)
    env["BGT_REPO"] = REPO
    env["BGT_SCALE_DIR"] = scale_dir + f"/n{nproc}"
    os.makedirs(env["BGT_SCALE_DIR"], exist_ok=True)
    procs = []
    for pid in range(nproc):
        cores = ",".join(
            str(c) for c in range(pid * cores_per_proc,
                                  (pid + 1) * cores_per_proc)
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER, str(pid), str(nproc),
                 f"127.0.0.1:{port}", cores],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=REPO,
            )
        )
    # Drain every worker concurrently: a sequential communicate() can
    # deadlock a gloo leg when a later worker fills its 64KiB pipe and
    # blocks inside a collective the first worker participates in.
    import threading

    results = [None] * len(procs)

    def _drain(i, p):
        results[i] = p.communicate(timeout=3600)

    threads = [
        threading.Thread(target=_drain, args=(i, p))
        for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    legs = []
    for p, (out, err) in zip(procs, results):
        if p.returncode != 0:
            raise RuntimeError(f"leg rc={p.returncode}: {err[-500:]}")
        for ln in out.splitlines():
            if ln.startswith("LEG "):
                legs.append(json.loads(ln[4:]))
    assert len(legs) == nproc, legs
    recs = {l["records"] for l in legs}
    assert len(recs) == 1, f"processes disagree on records: {recs}"
    return max(l["call_s"] for l in legs), legs[0]["records"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpp = 2
    if "--cores-per-proc" in sys.argv:
        cpp = int(sys.argv[sys.argv.index("--cores-per-proc") + 1])
    ncores = len(os.sched_getaffinity(0))
    if n * cpp > ncores:
        cpp = max(1, ncores // n)
    scale_dir = "/tmp/bgt_scaling"
    t1, recs1 = run_leg(1, cpp, scale_dir)
    tn, recsn = run_leg(n, cpp, scale_dir)
    # a region-sharding merge regression must fail the bench, not just
    # skew the timing
    assert recs1 == recsn, (
        f"1-process and {n}-process legs disagree on records: "
        f"{recs1} vs {recsn}"
    )
    eff = t1 / (n * tn)
    out = {
        "metric": "scaling_efficiency",
        "n_processes": n,
        "cores_per_proc": cpp,
        "t1_s": t1,
        f"t{n}_s": tn,
        "records_1": recs1,
        f"records_{n}": recsn,
        "value": round(eff, 3),
        "target": 0.8,
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
