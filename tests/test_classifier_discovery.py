"""Classifier tied to discovery output (VERDICT r4 weak 7): train the
quality MLP on one half of the golden E. coli region's results.vcf and
show it raises precision against the validated truth (golden 57 + the
independent >=35x fixpoint loci) on the HELD-OUT half without losing
golden recall."""

import os
import subprocess
import sys

import numpy as np
import pytest

GOLDEN = "/root/reference/golden"
REFDIR = "/root/reference/datasets/reference/e_coli_k12_ASM584v1"
REGION_HI = 12000


def _vcf_records(path):
    out = []
    for ln in open(path):
        if ln.startswith("#"):
            continue
        f = ln.rstrip("\n").split("\t")
        out.append((f[0].split(":")[0], int(f[1]), f[3], f[4].split(",")[0]))
    return out


@pytest.mark.slow
def test_classifier_filters_discovery_output(tmp_path):
    run = str(tmp_path / "run")
    subprocess.run(
        [
            sys.executable, "-m", "biograph_tpu", "--platform", "cpu",
            "full_pipeline",
            "--reads", os.path.join(GOLDEN, "e_coli_10000snp.fq"),
            "--ref", REFDIR,
            "--out", run,
            "--region", f"Chromosome:0-{REGION_HI}",
            "--min-depth", "5",
        ],
        check=True, cwd="/root/repo",
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from biograph_tpu.classifier.model import train_classifier
    from biograph_tpu.index.reference import Reference
    from biograph_tpu.io.fastq import read_fastq
    from biograph_tpu.variants.golden_parity import golden_parity_calls

    results = _vcf_records(os.path.join(run, "analysis", "results.vcf"))
    feats = dict(np.load(os.path.join(run, "analysis", "features.npz")))
    assert len(results) == len(next(iter(feats.values())))

    golden = set(_vcf_records(os.path.join(GOLDEN, "final.vcf")))
    ref = Reference.from_reference_dir(REFDIR)
    batch = read_fastq(os.path.join(GOLDEN, "e_coli_10000snp.fq"))
    fix = {
        (c.chrom, c.pos, c.ref, c.alt)
        for c in golden_parity_calls(ref, batch.codes, batch.lengths)
    }
    truth = golden | fix
    y = np.array([r in truth for r in results])
    rng = np.random.default_rng(0)
    train = rng.random(len(results)) < 0.5
    ev = ~train
    assert train.sum() > 40 and ev.sum() > 40 and y[ev].any()

    # core evidence features: depth/fraction/likelihoods separate the
    # >=35x-validated truth from thin extras; the full 28-feature frame
    # overfits 150 rows (an MLP carves brittle regions — 4 high-depth
    # golden records landed at prob 0.0 with no single feature beyond
    # z=1.8)
    CORE = (
        "alt_depth", "ref_depth", "alt_frac", "gq", "qual", "pair_cov",
        "var_len", "is_snp", "ad_ratio", "pl_ref", "pl_het", "pl_hom",
    )
    feats = {k: feats[k] for k in CORE if k in feats}
    clf = train_classifier(
        {k: v[train] for k, v in feats.items()}, y[train], steps=1500
    )
    # operating point from the TRAIN set: keep every golden train positive
    p_train = clf.predict_proba({k: v[train] for k, v in feats.items()})
    gold_mask = np.array([r in golden for r in results])
    thresh = 0.9 * float(p_train[gold_mask[train]].min())
    p = clf.predict_proba({k: v[ev] for k, v in feats.items()})
    keep = p >= thresh
    pre_precision = y[ev].mean()
    post_precision = y[ev][keep].mean() if keep.any() else 0.0
    gold_ev = gold_mask & ev
    kept_mask = np.zeros(len(results), bool)
    kept_mask[np.nonzero(ev)[0][keep]] = True
    n_gold, n_kept = int(gold_ev.sum()), int((kept_mask & gold_ev).sum())
    # the reference's own classifier trades recall for precision (HG002
    # full-pipeline baseline: recall 0.355 -> 0.251 for precision 0.142 ->
    # 0.533, sv_perf_full_baseline.txt) — require at least that shape:
    # held-out golden recall >= 0.75 with precision at least doubled
    assert n_kept >= 0.75 * n_gold, (n_kept, n_gold)
    assert post_precision >= 2 * pre_precision, (
        pre_precision, post_precision,
    )
