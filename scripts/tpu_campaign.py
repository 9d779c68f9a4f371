"""TPU measurement campaign driver for an INTERMITTENT relay.

The axon relay alternates between ~10-min responsive windows and wedges
(CLAUDE.md).  This driver works through a queue of measurement legs —
full bench first, then the dispatch-knob sweep CLAUDE.md says to run
"first thing" — probing before each leg and resuming where it left off, so
every responsive window makes progress.  Results append to
/tmp/tpu_campaign.jsonl; state in /tmp/tpu_campaign_state.json.

Usage: python scripts/tpu_campaign.py   (loops until queue done)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/tpu_campaign.jsonl"
STATE = "/tmp/tpu_campaign_state.json"

LEG = r"""
import time, json, sys
from biograph_tpu.io.fastq import read_fastq
from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.build.readmap_build import build_readmap
from biograph_tpu.index.reference import Reference
from biograph_tpu.variants.discover import DiscoverOptions, discover_variants

batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
ref = Reference.from_reference_dir(
    "/root/reference/datasets/reference/e_coli_k12_ASM584v1")
opt = DiscoverOptions(min_alt_support=5)
t0 = time.time()
ss = build_seqset(batch.codes, batch.lengths)
rm = build_readmap(ss, batch.codes, batch.lengths)
build_s = time.time() - t0
discover_variants(ss, ref, opt=opt, readmap=rm)   # warmup/compile
stats = {}
t0 = time.time()
recs = discover_variants(ss, ref, opt=opt, readmap=rm, stats=stats)
print("CALL", json.dumps({"call_s": round(time.time() - t0, 2),
                          "build_s": round(build_s, 2),
                          "records": len(recs),
                          "stage_s": {k: round(v, 2)
                                      for k, v in stats["stage_s"].items()}}))
"""

# Queue: the full-bench leg, then knob A/Bs (one env delta each vs default)
QUEUE = [
    ("bench", None),
    ("default", {}),
    ("wave_block_1", {"BGT_WAVE_BLOCK": "1"}),
    ("wave_block_16", {"BGT_WAVE_BLOCK": "16"}),
    ("chain_block_1", {"BGT_CHAIN_BLOCK": "1"}),
    ("chain_block_16", {"BGT_CHAIN_BLOCK": "16"}),
    ("wave_lanes_16384", {"BGT_WAVE_LANES": "16384"}),
    ("check_every_48", {"BGT_CHECK_EVERY": "48"}),
    # walk engine A/B (default is now the probe pipeline — the 11:37 bench
    # measured the walk at 380 s/genome over the relay's per-launch latency)
    ("walk_probes_1", {"BGT_WALK_PROBES": "1"}),
    ("no_compact", {"BGT_NO_WAVE_COMPACT": "1"}),
    ("no_mxu_chains", {"BGT_NO_MXU_CHAINS": "1"}),
]


def probe(timeout_s=120):
    code = "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s, text=True, cwd=REPO,
        )
        return r.returncode == 0 and "28" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def log(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_leg(name, env_delta, timeout_s=3300):
    if name == "bench":
        r = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True,
            timeout=timeout_s + 300, cwd=REPO,
        )
        try:
            parsed = json.loads(r.stdout.strip().splitlines()[-1])
        except Exception:
            parsed = {"error": r.stderr[-300:]}
        ok = parsed.get("value", 0) > 0
        log({"leg": name, **parsed})
        return ok
    env = dict(os.environ)
    env.update(env_delta)
    try:
        r = subprocess.run(
            [sys.executable, "-c", LEG], env=env, capture_output=True,
            text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        log({"leg": name, "error": "timeout"})
        return False
    for ln in r.stdout.splitlines():
        if ln.startswith("CALL "):
            log({"leg": name, **env_delta, **json.loads(ln[5:])})
            return True
    log({"leg": name, "error": (r.stderr or r.stdout)[-300:]})
    return False


def main():
    done = set()
    if os.path.exists(STATE):
        done = set(json.load(open(STATE))["done"])
    while True:
        todo = [(n, e) for n, e in QUEUE if n not in done]
        if not todo:
            log({"leg": "_campaign", "status": "complete"})
            return
        if probe():
            name, env_delta = todo[0]
            ok = run_leg(name, env_delta)
            if ok:
                done.add(name)
                with open(STATE, "w") as f:
                    json.dump({"done": sorted(done)}, f)
        else:
            log({"leg": "_probe", "status": "wedged"})
            time.sleep(120)


if __name__ == "__main__":
    main()
