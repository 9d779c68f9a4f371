"""Benchmark driver: reads/s through the variant-calling compute on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Pipeline measured: seed-lookup + vectorized verify + pileup scatter-add over
the golden E. coli read set against the full E. coli reference (the flagship
single-chip step; BASELINE.md target: >=5x CPU reads/s per chip).
vs_baseline = TPU reads/s / CPU reads/s measured in-process with the same
jitted code on the host backend.
"""

import json
import sys
import time

import numpy as np


def _load():
    from biograph_tpu.index.reference import Reference
    from biograph_tpu.io.fastq import read_fastq

    ref = Reference.from_reference_dir(
        "/root/reference/datasets/reference/e_coli_k12_ASM584v1"
    )
    batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
    return ref, batch


def _bench_backend(platform: str, ref, batch, repeats: int = 5, dup: int = 8):
    import jax

    dev = jax.devices(platform)[0]
    import jax.numpy as jnp
    import numpy as np
    from biograph_tpu.variants.align import RefKmerIndex, _place_jit

    with jax.default_device(dev):
        idx = RefKmerIndex.build(ref.flat, 13, ref.is_n)
        # throughput batch: replicate the read set to steady-state size
        codes_np = np.tile(batch.codes, (dup, 1))
        lens_np = np.tile(batch.lengths, dup)
        R, L = codes_np.shape
        fn = _place_jit(idx, L, 5, 3, 8)
        codes = jax.device_put(jnp.asarray(codes_np), dev)
        lengths = jax.device_put(jnp.asarray(lens_np, jnp.int32), dev)
        # warmup/compile
        out = fn(codes, lengths)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(repeats):
            out = fn(codes, lengths)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / repeats
    return R / dt


def main():
    import jax

    ref, batch = _load()
    platforms = {d.platform for d in jax.devices()}
    tpu_like = [p for p in ("tpu",) if p in platforms]
    if tpu_like:
        tpu_rps = _bench_backend(tpu_like[0], ref, batch)
    else:
        tpu_rps = _bench_backend("cpu", ref, batch)
    try:
        cpu_rps = _bench_backend("cpu", ref, batch, repeats=2)
    except Exception:
        cpu_rps = None
    vs = (tpu_rps / cpu_rps) if cpu_rps else 1.0
    print(
        json.dumps(
            {
                "metric": "variant_call_reads_per_s",
                "value": round(tpu_rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
