"""TPU measurement campaign — ONE persistent relay client.

The axon relay alternates short responsive windows with wedges, and it
appears to tolerate client churn poorly (a window died immediately after a
probe client disconnected).  So this driver holds a single connection for
its whole life: the liveness probe is a tiny op awaited in a worker thread
with a soft timeout (a hung op just parks the thread; the process never
kills the socket), and measurement legs run in-process, reusing one warm
compile cache and one connection.  Knobs are flipped by patching module
globals (their env vars are read at import time).

Results append to /tmp/tpu_campaign.jsonl; resumable via
/tmp/tpu_campaign_state.json.  Run: nohup python scripts/tpu_campaign.py &
"""

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = "/tmp/tpu_campaign.jsonl"
STATE = "/tmp/tpu_campaign_state.json"


def log(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_with_timeout(fn, timeout_s):
    """Run fn in a worker thread; (ok, value|None).  A hung fn parks its
    daemon thread instead of killing the process/socket."""
    out = {}
    done = threading.Event()

    def w():
        try:
            out["v"] = fn()
        except Exception as e:  # noqa: BLE001
            out["e"] = repr(e)
        done.set()

    t = threading.Thread(target=w, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        return False, None
    if "e" in out:
        return False, out["e"]
    return True, out.get("v")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    def probe():
        return int(np.asarray(jnp.arange(8).sum() + np.random.randint(0, 1)))

    from biograph_tpu.io.fastq import read_fastq
    from biograph_tpu.build.seqset_build import build_seqset
    from biograph_tpu.build.readmap_build import build_readmap
    from biograph_tpu.index.reference import Reference

    batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
    ref = Reference.from_reference_dir(
        "/root/reference/datasets/reference/e_coli_k12_ASM584v1"
    )

    state = {"built": False}

    def ensure_built():
        if not state["built"]:
            state["ss"] = build_seqset(batch.codes, batch.lengths)
            state["rm"] = build_readmap(state["ss"], batch.codes, batch.lengths)
            state["built"] = True

    def pipeline_leg():
        from biograph_tpu.variants.discover import (
            DiscoverOptions,
            discover_variants,
        )

        ensure_built()
        opt = DiscoverOptions(min_alt_support=5)
        ss, rm = state["ss"], state["rm"]
        discover_variants(ss, ref, opt=opt, readmap=rm)  # warm
        stats = {}
        t0 = time.time()
        recs = discover_variants(ss, ref, opt=opt, readmap=rm, stats=stats)
        return {
            "call_s": round(time.time() - t0, 2),
            "records": len(recs),
            "stage_s": {
                k: round(v, 2) for k, v in stats["stage_s"].items()
            },
        }

    def rank_leg():
        from biograph_tpu.ops.rank4 import (
            build_rank4_table,
            rank4_pallas,
            rank4_xla,
        )

        ensure_built()
        ss = state["ss"]
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

        rates = {"xla_qps": round(timeit(lambda: xla_j(pos)))}
        table = build_rank4_table(ss.prev_words, ss.prev_cum)
        if table is not None:
            got = np.asarray(rank4_pallas(table, pos))
            assert (got == np.asarray(xla_j(pos))).all()
            rates["pallas_qps"] = round(timeit(lambda: rank4_pallas(table, pos)))
        return rates

    def knob_leg(**patch):
        import biograph_tpu.variants.discover as D
        import biograph_tpu.index.probes as PR

        saved_env = {}
        saved = {}
        for k, v in patch.items():
            if k in ("WAVE_BLOCK", "WAVE_LANES", "CHECK_EVERY"):
                saved[(D, k)] = getattr(D, k)
                setattr(D, k, int(v))
            elif k in ("CHAIN_BLOCK", "WALK_LANES", "WALK_OWN",
                       "WALK_DEV_OWN", "WALK_WIDEN_EVERY"):
                saved[(PR, k)] = getattr(PR, k)
                setattr(PR, k, int(v))
            else:  # env-dispatched gates (BGT_*)
                saved_env[k] = os.environ.get(k)
                os.environ[k] = str(v)
        try:
            return pipeline_leg()
        finally:
            for (m, k), v in saved.items():
                setattr(m, k, v)
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    queue = [
        # default now = single-launch device walk (probes.walk_ranges_device)
        ("pipeline_default", lambda: pipeline_leg(), 3000),
        ("rank4", lambda: rank_leg(), 1200),
        # A/B: the probe pipeline front end (round-3 default)
        ("probe_pipeline", lambda: knob_leg(BGT_WALK_DEVICE="0"), 3000),
        # A/B: dense device walk (prescreen off)
        ("no_prescreen", lambda: knob_leg(BGT_NO_PRESCREEN="1"), 3000),
        # NOTE: walk_own_512 (lane-geometry resweep) CRASHED the TPU worker
        # reproducibly at 13:09 and 13:40 ("kernel fault") and wedged the
        # relay both times — geometry sweeps stay off until that fault is
        # understood; own=128 is stable.
        # whole-device while_loop wavefront vs the block-dispatch default
        ("wave_device_1", lambda: knob_leg(BGT_WAVE_DEVICE="1"), 1800),
        # coverage-scorer A/B: whole-chain kernel (default) vs single XLA
        # program vs MXU host-dispatched chains
        ("cov_no_kernel", lambda: knob_leg(BGT_NO_COV_KERNEL="1"), 1800),
        ("cov_hostloop", lambda: knob_leg(BGT_COV_HOSTLOOP="1"), 1800),
        ("pipeline_repeat", lambda: pipeline_leg(), 1200),
    ]
    done = set()
    if os.path.exists(STATE):
        done = set(json.load(open(STATE))["done"])
    while True:
        todo = [(n, f, to) for n, f, to in queue if n not in done]
        if not todo:
            log({"leg": "_campaign", "status": "complete"})
            return
        ok, _ = run_with_timeout(probe, 90)
        if not ok:
            log({"leg": "_probe", "status": "wedged"})
            time.sleep(90)
            continue
        name, fn, to = todo[0]
        t0 = time.time()
        ok, val = run_with_timeout(fn, to)
        if ok and isinstance(val, dict):
            log({"leg": name, **val, "leg_wall_s": round(time.time() - t0, 1)})
            done.add(name)
            with open(STATE, "w") as f:
                json.dump({"done": sorted(done)}, f)
        else:
            log({"leg": name, "error": str(val) if val else "timeout/hang"})
            time.sleep(60)


if __name__ == "__main__":
    main()
