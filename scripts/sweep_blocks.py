"""Sweep wavefront/chain dispatch knobs on the live chip.

Block-fused dispatch divides the fixed per-launch relay cost by the block
size, but XLA compile time grows superlinearly in unrolled rank steps —
the sweet spot is hardware-specific and was untuned while the relay was
wedged (CLAUDE.md round-2 notes).  One subprocess per config (the env vars
are read at import time); each leg reuses the persistent compile cache, so
re-running a config is cheap.

Usage: python scripts/sweep_blocks.py [KEY=V1,V2 ...]
       e.g. python scripts/sweep_blocks.py WAVE_BLOCK=1,8,16 CHAIN_BLOCK=8 \
                WAVE_LANES=4096,16384 CHECK_EVERY=16,48
Keys are the BGT_* env suffixes (WAVE_BLOCK, CHAIN_BLOCK, WAVE_LANES,
CHECK_EVERY, NO_WAVE_COMPACT, WALK_LANES, ...).  Runs the cartesian
product; prints one JSON line per config with the warm call time and the
per-stage split.
"""

import itertools
import json
import os
import subprocess
import sys

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
ss = build_seqset(batch.codes, batch.lengths)
rm = build_readmap(ss, batch.codes, batch.lengths)
discover_variants(ss, ref, opt=opt, readmap=rm)   # warmup/compile
stats = {}
t0 = time.time()
recs = discover_variants(ss, ref, opt=opt, readmap=rm, stats=stats)
print("CALL", json.dumps({"call_s": round(time.time() - t0, 2),
                          "records": len(recs),
                          "stage_s": {k: round(v, 2)
                                      for k, v in stats["stage_s"].items()}}))
"""


def run(cfg: dict, timeout: int = 2400):
    env = dict(os.environ)
    for k, v in cfg.items():
        env["BGT_" + k] = str(v)
    try:
        r = subprocess.run(
            [sys.executable, "-c", LEG], env=env, capture_output=True,
            text=True, timeout=timeout, cwd="/root/repo",
        )
    except subprocess.TimeoutExpired:
        return {**cfg, "error": "timeout"}
    for ln in r.stdout.splitlines():
        if ln.startswith("CALL "):
            return {**cfg, **json.loads(ln[5:])}
    return {**cfg, "error": r.stderr[-200:]}


def main():
    args = sys.argv[1:] or ["WAVE_BLOCK=1,8,16"]
    keys = []
    vals = []
    for a in args:
        k, v = a.split("=", 1)
        keys.append(k)
        vals.append(v.split(","))
    for combo in itertools.product(*vals):
        print(json.dumps(run(dict(zip(keys, combo)))), flush=True)


if __name__ == "__main__":
    main()
