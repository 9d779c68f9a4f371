"""Benchmark driver — prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline: steady-state variant-discovery throughput (bases/s) of the
wavefront assembly engine on the real chip, against the golden E. coli
sample — the "seqset build + variant call" pipeline of BASELINE.md measured
at its hot stage.  vs_baseline = TPU / host-CPU steady-state on identical
regions (warmup region excluded from both timings: compiles amortize over a
genome at scale).

Setup (seqset+readmap build) runs once on the host; artifacts are cached
under /tmp between runs.
"""

import json
import os
import time


def _ensure_sample():
    """Build (or reuse) the E. coli .bgt from the golden reads."""
    import jax

    path = "/tmp/bench_ecoli.bgt"
    from biograph_tpu.core import container

    if not container.exists(os.path.join(path, "seqset")):
        from biograph_tpu.io.fastq import read_fastq
        from biograph_tpu.build.seqset_build import build_seqset
        from biograph_tpu.build.readmap_build import build_readmap

        with jax.default_device(jax.devices("cpu")[0]):
            batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
            ss = build_seqset(batch.codes, batch.lengths)
            rm = build_readmap(ss, batch.codes, batch.lengths)
        os.makedirs(path, exist_ok=True)
        ss.save(os.path.join(path, "seqset"))
        rm.save(os.path.join(path, "readmap"))
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump({"accession_id": "bench"}, f)
    return path


def _rank_rate(bgt: str):
    """Rank-query throughput of the MXU kernel vs the XLA gather path on the
    active platform (the speed-of-light microbenchmark SURVEY §7 hard-part 3
    calls for; reference yardstick: modules/io/bitcount.h:13 count())."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from biograph_tpu.index.seqset import Seqset
    from biograph_tpu.ops.rank4 import build_rank4_table, rank4_pallas, rank4_xla

    ss = Seqset.load(os.path.join(bgt, "seqset"))
    rng = np.random.default_rng(0)
    B = 1 << 16
    pos = jnp.asarray(rng.integers(0, ss.n_entries + 1, B))
    pw = jnp.asarray(ss.prev_words)
    pc = jnp.asarray(ss.prev_cum)
    xla_j = jax.jit(lambda p: rank4_xla(pw, pc, p))

    def timeit(f, reps=30):
        f().block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            r = f()
        r.block_until_ready()
        return B * 4 * reps / (time.time() - t0)

    rates = {"xla": timeit(lambda: xla_j(pos))}
    table = build_rank4_table(ss.prev_words, ss.prev_cum)
    if table is not None and jax.devices()[0].platform != "cpu":
        got = np.asarray(rank4_pallas(table, pos))
        want = np.asarray(xla_j(pos))
        assert (got == want).all(), "rank4 kernel mismatch"
        rates["pallas"] = timeit(lambda: rank4_pallas(table, pos))
    return rates


def _discovery_rate(platform: str, bgt: str, span: int = 20000) -> float:
    """Steady-state discovery bases/s on `platform` (warmup region first)."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # else: keep the ambient accelerator platform (axon registers the TPU
    # under its own platform name; forcing "tpu" looks for local libtpu)
    # fresh modules bind arrays to the selected backend
    from biograph_tpu.api import BioGraph
    from biograph_tpu.index.reference import Reference
    from biograph_tpu.variants.discover import DiscoverOptions, discover_variants

    bg = BioGraph(bgt)
    ref = Reference.from_reference_dir(
        "/root/reference/datasets/reference/e_coli_k12_ASM584v1"
    )
    c = ref.contig_by_name("Chromosome")
    opt = DiscoverOptions(min_alt_support=5)
    # warmup (compiles), then time repeated runs of the variant-dense region
    # (0-12kb holds most of the sample's variants: a representative load)
    dense = (c.start, c.start + 12000)
    discover_variants(bg.seqset, ref, region=dense, opt=opt, readmap=bg.readmap)
    REP = 2
    t0 = time.time()
    for _ in range(REP):
        discover_variants(
            bg.seqset, ref, region=dense, opt=opt, readmap=bg.readmap
        )
    dt = time.time() - t0
    return REP * 12000 / dt


def main():
    import subprocess
    import sys

    bgt = _ensure_sample()
    # one subprocess per platform (backend selection is sticky); run them
    # concurrently — the TPU leg mostly waits on the remote chip
    procs = {}
    for platform in ("tpu", "cpu"):
        rank_part = (
            "rr = bench._rank_rate(%r);"
            "print('RANK', rr.get('pallas', 0.0), rr.get('xla', 0.0));"
            % bgt
            if platform == "tpu"
            else ""
        )
        code = (
            "import json,sys; sys.path.insert(0, '/root/repo');"
            "import bench;"
            f"r = bench._discovery_rate({platform!r}, {bgt!r});"
            "print('RATE', r);" + rank_part
        )
        procs[platform] = subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
        )
    rates = {}
    rank = {}
    for platform, p in procs.items():
        try:
            stdout, stderr = p.communicate(timeout=900)
            for ln in stdout.splitlines():
                if ln.startswith("RATE "):
                    rates[platform] = float(ln.split()[1])
                if ln.startswith("RANK "):
                    rank = {
                        "rank_mxu_queries_per_s": round(float(ln.split()[1]), 0),
                        "rank_xla_queries_per_s": round(float(ln.split()[2]), 0),
                    }
            if platform not in rates:
                print(
                    f"bench: {platform} leg produced no RATE; stderr tail: "
                    + stderr[-300:].replace(chr(10), " | "),
                    file=sys.stderr,
                )
        except Exception as e:
            p.kill()
            print(f"bench: {platform} leg failed: {e}", file=sys.stderr)
    tpu = rates.get("tpu")
    cpu = rates.get("cpu")
    if tpu is None:
        # TPU leg failed: say so rather than reporting the CPU rate as a
        # chip number with vs_baseline pinned to 1.0
        print(
            json.dumps(
                {
                    "metric": "discovery_bases_per_s",
                    "value": round(cpu or 0.0, 1),
                    "unit": "bases/s",
                    "vs_baseline": 0.0,
                    "platform": "cpu-fallback",
                    "error": "tpu leg produced no rate",
                }
            )
        )
        return
    vs = round(tpu / cpu, 2) if cpu else 0.0
    print(
        json.dumps(
            {
                "metric": "discovery_bases_per_s",
                "value": round(tpu, 1),
                "unit": "bases/s",
                "vs_baseline": vs,
                "platform": "tpu",
                "cpu_bases_per_s": round(cpu or 0.0, 1),
                **rank,
            }
        )
    )


if __name__ == "__main__":
    main()
