import numpy as np
import jax.numpy as jnp

from biograph_tpu.core import dna
from biograph_tpu.kmers.count import count_kmers
from biograph_tpu.kmers.kmer_set import KmerSet
from biograph_tpu.build.correct import correct_reads


def _mk_reads(genome, n, L, rng):
    starts = rng.integers(0, len(genome) - L, size=n)
    return np.stack([genome[s : s + L] for s in starts]), starts


def test_correct_single_errors(rng):
    G = 3000
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    L = 50
    reads, _ = _mk_reads(genome, 1200, L, rng)
    lens = np.full(len(reads), L, np.int32)
    counts = count_kmers(reads, lens, k=23)
    ks = KmerSet.from_counts(counts, min_count=3)

    # corrupt 50 reads with one substitution each (not in the first k bases
    # so the anchor stays at 0)
    bad = reads.copy()
    idx = rng.choice(len(reads), size=50, replace=False)
    for i in idx:
        p = rng.integers(25, L)
        bad[i, p] = (bad[i, p] + rng.integers(1, 4)) % 4
    res = correct_reads(ks, bad, lens)
    fixed = 0
    for i in idx:
        if res.lengths[i] == L and (res.codes[i] == reads[i]).all():
            fixed += 1
    assert fixed >= 45, f"only {fixed}/50 corrected"
    # clean reads unchanged
    # clean reads: unchanged up to their (possibly edge-truncated) length —
    # reads near genome ends can lose low-coverage tail k-mers, like the
    # reference's fast_read_correct returning the longest trusted run.
    clean = [i for i in range(len(reads)) if i not in set(idx)]
    full = 0
    for i in clean[:100]:
        n = res.lengths[i]
        assert n >= 23
        assert (res.codes[i, :n] == reads[i][:n]).all()
        full += int(n == L)
    assert full >= 90


def test_uncorrectable_reads_dropped(rng):
    G = 2000
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    L = 40
    reads, _ = _mk_reads(genome, 800, L, rng)
    lens = np.full(len(reads), L, np.int32)
    ks = KmerSet.from_counts(count_kmers(reads, lens, k=23), min_count=3)
    junk = rng.integers(0, 4, size=(5, L), dtype=np.uint8)
    res = correct_reads(ks, junk, np.full(5, L, np.int32))
    assert (res.lengths == 0).all()


def test_error_burst_truncates(rng):
    G = 2000
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    L = 40
    reads, _ = _mk_reads(genome, 800, L, rng)
    lens = np.full(len(reads), L, np.int32)
    ks = KmerSet.from_counts(count_kmers(reads, lens, k=23), min_count=3)
    bad = reads[:3].copy()
    bad[:, 30:] = rng.integers(0, 4, size=(3, 10), dtype=np.uint8)
    res = correct_reads(ks, bad, np.full(3, L, np.int32), max_corrections=2)
    # reads should be truncated near the burst, not fully dropped
    for i in range(3):
        assert 23 <= res.lengths[i] <= L
        assert (res.codes[i, : min(30, res.lengths[i])] == reads[i][: min(30, res.lengths[i])]).all()
