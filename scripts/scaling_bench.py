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
sys.path.insert(0, REPO)

WORKER = r"""
import os, sys, time, json
pid, nproc, coord, cores = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
os.sched_setaffinity(0, {int(c) for c in cores.split(",")})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.environ["BGT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from biograph_tpu.index.seqset import Seqset
from biograph_tpu.index.readmap import Readmap
from biograph_tpu.index.reference import Contig
from biograph_tpu.variants.discover import DiscoverOptions, discover_variants
from biograph_tpu.parallel.discovery import discover_variants_distributed
from biograph_tpu.parallel.distributed import initialize

if nproc > 1:
    initialize(coordinator=coord, num_processes=nproc, process_id=pid)

# the COMPUTE-BOUND workload (bench.py's scaled leg): the golden toy now
# finishes in ~1s after the round-5 uniform-coverage fix — too small to
# measure scaling.  Artifacts are built ONCE by the parent and loaded here.
art = os.environ["BGT_SCALE_ART"]
ss = Seqset.load(art + "/seqset")
rm = Readmap.load(art + "/readmap", ss)
flat = np.load(art + "/genome.npy")

class Ref:
    pass
ref = Ref()
ref.flat = flat
ref.is_n = np.zeros(len(flat), bool)
ref.contigs = [Contig(name="chr", start=0, length=len(flat))]
ref.contig_by_name = lambda name: ref.contigs[0]

opt = DiscoverOptions(min_alt_support=5)
run_dir = os.environ["BGT_SCALE_DIR"] + "/warm"
recs = discover_variants_distributed(ss, ref, run_dir, opt=opt, readmap=rm)
t0 = time.time()
run_dir = os.environ["BGT_SCALE_DIR"] + "/timed"
recs = discover_variants_distributed(ss, ref, run_dir, opt=opt, readmap=rm)
dt = time.time() - t0
# within-contract digest: wavefront sharding guarantees equality only for
# records whose ref span fits the slice overlap (giant rejoins crossing a
# cut by more than `overlap` are the SV engine's, parallel/discovery.py
# module docstring) — digest those, count the out-of-contract giants
import hashlib
overlap = opt.max_path + opt.rejoin_k + opt.probe_ctx + 2
core = sorted(
    (r["chrom"], r["pos"], r["ref"], r["alt"])
    for r in recs if len(r["ref"]) <= overlap
)
digest = hashlib.sha256(json.dumps(core).encode()).hexdigest()[:16]
print("LEG", json.dumps({"pid": pid, "call_s": round(dt, 2),
                         "records": len(recs), "core_records": len(core),
                         "giants": len(recs) - len(core),
                         "digest": digest}), flush=True)
"""


def build_artifacts(scale_dir: str) -> str:
    """Build the scaled workload's seqset/readmap once (deterministic;
    reused by every leg's workers)."""
    art = os.path.join(scale_dir, "artifacts")
    if os.path.exists(os.path.join(art, "genome.npy")):
        return art
    os.makedirs(art, exist_ok=True)
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    from biograph_tpu.build.seqset_build import build_seqset
    from biograph_tpu.build.readmap_build import build_readmap

    rng = np.random.default_rng(12345)
    G, L, R = 2_000_000, 100, 120_000
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    donor = genome.copy()
    snp = rng.choice(np.arange(200, G - 200), 4000, replace=False)
    donor[snp] = (donor[snp] + 1 + rng.integers(0, 3, 4000)) % 4
    starts = rng.integers(0, G - L, R)
    codes = donor[starts[:, None] + np.arange(L)]
    half = R // 2
    codes[:half] = (3 - codes[:half])[:, ::-1]
    lengths = np.full(R, L, np.int32)
    ss = build_seqset(codes, lengths)
    rm = build_readmap(ss, codes, lengths)
    ss.save(os.path.join(art, "seqset"))
    rm.save(os.path.join(art, "readmap"))
    np.save(os.path.join(art, "genome.npy"), genome)
    return art


def run_leg(nproc: int, cores_per_proc: int, scale_dir: str):
    port = 12421 + nproc
    env = dict(os.environ)
    env["BGT_REPO"] = REPO
    env["BGT_SCALE_DIR"] = scale_dir + f"/n{nproc}"
    env["BGT_SCALE_ART"] = build_artifacts(scale_dir)
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
    return max(l["call_s"] for l in legs), legs[0]


ENTRY_WORKER = r"""
import os, sys, time, json
nd, cores = int(sys.argv[1]), sys.argv[2]
os.sched_setaffinity(0, {int(c) for c in cores.split(",")})
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nd}"
sys.path.insert(0, os.environ["BGT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import Mesh
from biograph_tpu.io.fastq import read_fastq
from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.build.readmap_build import build_readmap
from biograph_tpu.index.reference import Reference
from biograph_tpu.variants.discover import DiscoverOptions, discover_variants

batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
ref = Reference.from_reference_dir(
    "/root/reference/datasets/reference/e_coli_k12_ASM584v1")
ss = build_seqset(batch.codes, batch.lengths)
rm = build_readmap(ss, batch.codes, batch.lengths)
opt = DiscoverOptions(min_alt_support=5)
# 500 kb region: larger spans (bisected: OK at 500kb, SIGABRT by 2.3Mb)
# crash XLA:CPU's thunk executor on the forced-multi-device host mesh at
# any device count >1 — an XLA:CPU toolchain ceiling, not an engine
# property (the same engine at 8 devices passes the golden-region gate in
# tests/test_sharded_discovery.py; real TPU meshes don't use this path)
region = (0, 500_000)
engine = None
if nd > 1:
    from biograph_tpu.parallel.sharded_discovery import ShardedDiscoveryEngine
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("model",))
    engine = ShardedDiscoveryEngine(ss, mesh)
recs = discover_variants(
    ss, ref, region=region, opt=opt, readmap=rm, engine=engine)  # warm
t0 = time.time()
recs = discover_variants(
    ss, ref, region=region, opt=opt, readmap=rm, engine=engine)
print("LEG", json.dumps({"nd": nd, "call_s": round(time.time() - t0, 2),
                         "records": len(recs)}), flush=True)
"""


def run_entry_leg(n_devices: int):
    """Entry-sharded engine leg: ONE process, n virtual devices, pinned to
    ALL cores — measures shard_map/psum overhead at constant hardware (one
    host has no extra cores to scale onto; true cross-host entry-sharded
    scaling needs a multi-host slice).  value = t1/tN (>=0.8 means the
    sharding machinery costs <=25%)."""
    env = dict(os.environ)
    env["BGT_REPO"] = REPO
    cores = ",".join(str(c) for c in sorted(os.sched_getaffinity(0)))
    p = subprocess.run(
        [sys.executable, "-c", ENTRY_WORKER, str(n_devices), cores],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if p.returncode != 0:
        raise RuntimeError(f"entry leg rc={p.returncode}: {p.stderr[-500:]}")
    for ln in p.stdout.splitlines():
        if ln.startswith("LEG "):
            leg = json.loads(ln[4:])
            return leg["call_s"], leg["records"]
    raise RuntimeError("entry leg produced no LEG line")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpp = 2
    if "--cores-per-proc" in sys.argv:
        cpp = int(sys.argv[sys.argv.index("--cores-per-proc") + 1])
    ncores = len(os.sched_getaffinity(0))
    if n * cpp > ncores:
        cpp = max(1, ncores // n)
    scale_dir = "/tmp/bgt_scaling"
    t1, leg1 = run_leg(1, cpp, scale_dir)
    tn, legn = run_leg(n, cpp, scale_dir)
    # a region-sharding merge regression must fail the bench, not just skew
    # the timing — within the sharding contract (records whose ref span
    # fits the slice overlap; cross-cut giant rejoins are the SV engine's)
    assert leg1["digest"] == legn["digest"] and (
        leg1["core_records"] == legn["core_records"]
    ), (
        f"1-process and {n}-process legs disagree on in-contract records: "
        f"{leg1} vs {legn}"
    )
    eff = t1 / (n * tn)
    out = {
        "metric": "scaling_efficiency",
        "region_sharded": {
            "n_processes": n,
            "cores_per_proc": cpp,
            "t1_s": t1,
            f"t{n}_s": tn,
            "core_records": leg1["core_records"],
            "records_1": leg1["records"],
            f"records_{n}": legn["records"],
            "out_of_contract_giants": [leg1["giants"], legn["giants"]],
            "efficiency": round(eff, 3),
        },
        "value": round(eff, 3),
        "target": 0.8,
    }
    if "--no-build" not in sys.argv:
        # the round-5 rank-free engine made discovery fixed-cost-bound at
        # any workload this 4-core host can build (t1 ~7s) — the BUILD is
        # where the time lives (157s single-process) and is the
        # reference's central distributed operation
        # (biograph_create.cpp:922 worker fleet).  Measure its scaling
        # with the prefix-partitioned sharded build.
        import numpy as np

        rng = np.random.default_rng(12345)
        G, L, R = 2_000_000, 100, 120_000
        genome = rng.integers(0, 4, G, dtype=np.uint8)
        donor = genome.copy()
        snpi = rng.choice(np.arange(200, G - 200), 4000, replace=False)
        donor[snpi] = (donor[snpi] + 1 + rng.integers(0, 3, 4000)) % 4
        starts = rng.integers(0, G - L, R)
        codes = donor[starts[:, None] + np.arange(L)]
        codes[: R // 2] = (3 - codes[: R // 2])[:, ::-1]
        lengths = np.full(R, L, np.int32)
        from biograph_tpu.build.sharded_build import build_seqset_sharded
        import jax

        jax.config.update("jax_platforms", "cpu")
        t0 = time.time()
        ss1 = build_seqset_sharded(codes, lengths, n_workers=1)
        bt1 = time.time() - t0
        t0 = time.time()
        ssn = build_seqset_sharded(codes, lengths, n_workers=n)
        btn = time.time() - t0
        assert ss1.n_entries == ssn.n_entries
        out["sharded_build"] = {
            "n_workers": n,
            "t1_s": round(bt1, 2),
            f"t{n}_s": round(btn, 2),
            "entries": ss1.n_entries,
            "efficiency": round(bt1 / (n * btn), 3),
            "speedup": round(bt1 / btn, 2),
        }
        out["note"] = (
            "discovery is fixed-cost-bound at this host's feasible "
            "workloads after the round-5 rank-free engine (t1 ~7s); the "
            "build is the distributed-scaling surface"
        )
    if "--no-entry" not in sys.argv:
        et1, erecs1 = run_entry_leg(1)
        etn, erecsn = run_entry_leg(n)
        # entry-sharding has no region cuts: record counts match exactly
        # (its own leg pair; workload is the half-genome region — see
        # ENTRY_WORKER's XLA:CPU note)
        assert erecs1 == erecsn, (erecs1, erecsn)
        out["entry_sharded"] = {
            "n_devices": n,
            "t1_s": et1,
            f"t{n}_s": etn,
            "records": erecs1,
            # one host: same cores under both legs, so this is the
            # overhead-free fraction of the sharding machinery, not
            # cross-host speedup
            "constant_hw_efficiency": round(et1 / etn, 3),
        }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
