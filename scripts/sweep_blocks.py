"""Sweep BGT_WAVE_BLOCK / BGT_CHAIN_BLOCK on the live chip.

Block-fused dispatch divides the fixed per-launch relay cost by the block
size, but XLA compile time grows superlinearly in unrolled rank steps —
the sweet spot is hardware-specific and was untuned while the relay was
wedged (CLAUDE.md round-2 notes).  One subprocess per config (the env vars
are read at import time); each leg reuses the persistent compile cache, so
re-running a config is cheap.

Usage: python scripts/sweep_blocks.py [wave_sizes] [chain_sizes]
       e.g. python scripts/sweep_blocks.py 1,8,16 1,8,16
Prints one JSON line per config: {"wave": W, "chain": C, "call_s": T}.
"""

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


def run(wave: int, chain: int, timeout: int = 2400):
    env = dict(os.environ)
    env["BGT_WAVE_BLOCK"] = str(wave)
    env["BGT_CHAIN_BLOCK"] = str(chain)
    try:
        r = subprocess.run(
            [sys.executable, "-c", LEG], env=env, capture_output=True,
            text=True, timeout=timeout, cwd="/root/repo",
        )
    except subprocess.TimeoutExpired:
        return {"wave": wave, "chain": chain, "error": "timeout"}
    for ln in r.stdout.splitlines():
        if ln.startswith("CALL "):
            return {"wave": wave, "chain": chain, **json.loads(ln[5:])}
    return {"wave": wave, "chain": chain, "error": r.stderr[-200:]}


def main():
    waves = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "8").split(",")]
    chains = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "8").split(",")]
    for w in waves:
        for c in chains:
            print(json.dumps(run(w, c)), flush=True)


if __name__ == "__main__":
    main()
