import numpy as np
import pytest

from biograph_tpu.core import dna
from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.build.readmap_build import build_readmap
from biograph_tpu.io.vcf import VcfRecord, VcfWriter, read_vcf
from biograph_tpu.variants.coverage_tool import annotate_coverage, genotyper_log10


class FakeRef:
    def __init__(self, codes, name="chr1"):
        from biograph_tpu.index.reference import Contig

        self.flat = np.asarray(codes, np.uint8)
        self.contigs = [Contig(name=name, start=0, length=len(codes))]

    def contig_by_name(self, name):
        return self.contigs[0]


def _mk(rng, G=4000, L=40, coverage=30, donor=None):
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    src = donor(genome) if donor else genome
    n = int(len(src) * coverage / L)
    starts = rng.integers(0, len(src) - L, size=n)
    codes = np.stack([src[s : s + L] for s in starts])
    lens = np.full(n, L, np.int32)
    ss = build_seqset(codes, lens)
    rm = build_readmap(ss, codes, lens)
    return genome, src, ss, rm


def test_genotyper_log10_behaviour():
    gl = genotyper_log10(np.array([30, 30, 30]), np.array([0, 15, 30]))
    assert gl[0].argmax() == 0  # all ref
    assert gl[1].argmax() == 1  # het
    assert gl[2].argmax() == 2  # hom alt


def test_annotate_hom_and_absent(rng):
    # donor has a hom SNP at 1000
    def donor(g):
        d = g.copy()
        d[1000] = (d[1000] + 1) % 4
        return d

    genome, src, ss, rm = _mk(rng, donor=donor)
    ref = FakeRef(genome)
    alt_base = "ACGT"[(genome[1000] + 1) % 4]
    ref_base = "ACGT"[genome[1000]]
    other = "ACGT"[(genome[1000] + 2) % 4]
    recs = [
        VcfRecord(chrom="chr1", pos=1001, ref=ref_base, alt=alt_base),
        VcfRecord(chrom="chr1", pos=1001, ref=ref_base, alt=other),
        VcfRecord(chrom="chr1", pos=2001, ref="ACGT"[genome[2000]], alt="ACGT"[(genome[2000] + 1) % 4]),
    ]
    ann = annotate_coverage(rm, ref, recs)
    # hom SNP: strong alt, ~no ref
    assert ann.gt[0] == "1/1", (ann.alt_depth, ann.ref_depth, ann.gt)
    assert ann.alt_depth[0] >= 10
    # wrong alt allele at a hom-SNP site: neither allele has read support
    # (the donor haplotype carries the *other* alt) -> no-call
    assert ann.alt_depth[1] == 0
    assert ann.gt[1] == "./."
    # absent variant elsewhere: ref-only
    assert ann.gt[2] == "0/0"
    assert ann.ref_depth[2] >= 10


def test_annotate_het(rng):
    # half the reads carry the SNP: build donor reads from two haplotypes
    G, L = 4000, 40
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    hap2 = genome.copy()
    hap2[1500] = (hap2[1500] + 1) % 4
    n = G * 15 // L
    r1 = np.stack([genome[s : s + L] for s in rng.integers(0, G - L, size=n)])
    r2 = np.stack([hap2[s : s + L] for s in rng.integers(0, G - L, size=n)])
    codes = np.concatenate([r1, r2])
    lens = np.full(len(codes), L, np.int32)
    ss = build_seqset(codes, lens)
    rm = build_readmap(ss, codes, lens)
    ref = FakeRef(genome)
    rec = VcfRecord(
        chrom="chr1", pos=1501, ref="ACGT"[genome[1500]], alt="ACGT"[hap2[1500]]
    )
    ann = annotate_coverage(rm, ref, [rec])
    assert ann.gt[0] == "0/1", (ann.alt_depth, ann.ref_depth)


def test_pair_coverage(rng):
    """Paired reads spanning a variant produce PC support."""
    from biograph_tpu.io.vcf import VcfRecord
    from biograph_tpu.variants.coverage_tool import annotate_pair_coverage

    G, L, FRAG = 4000, 40, 200
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    donor = genome.copy()
    donor[2000] = (donor[2000] + 1) % 4  # hom SNP
    # paired reads: mate2 = revcomp of fragment end
    n = 600
    starts = rng.integers(0, G - FRAG, size=n)
    r1 = np.stack([donor[s : s + L] for s in starts])
    r2 = np.stack(
        [
            np.asarray(dna.revcomp_codes(donor[s + FRAG - L : s + FRAG]))
            for s in starts
        ]
    )
    codes = np.empty((2 * n, L), np.uint8)
    codes[0::2] = r1
    codes[1::2] = r2
    lens = np.full(2 * n, L, np.int32)
    mate_of = np.arange(2 * n, dtype=np.int64)
    mate_of[0::2] += 1
    mate_of[1::2] -= 1
    ss = build_seqset(codes, lens)
    rm = build_readmap(ss, codes, lens, mate_of)
    ref = FakeRef(genome)
    rec = VcfRecord(
        chrom="chr1", pos=2001, ref="ACGT"[genome[2000]], alt="ACGT"[donor[2000]]
    )
    pc = annotate_pair_coverage(rm, ref, [rec])
    # expected spanning pairs ~ coverage*frag/... just assert healthy support
    assert pc[0] >= 10, pc
    # a variant in an uncovered region of a second contig-less area: none
    rec2 = VcfRecord(chrom="chr1", pos=1, ref="ACGT"[genome[0]], alt="ACGT"[(genome[0]+1)%4])
    pc2 = annotate_pair_coverage(rm, ref, [rec2])
    assert pc2[0] <= 2


@pytest.mark.slow
def test_region_parallel_coverage_identical(tmp_path):
    """run_coverage_parallel (region worker pool, VERDICT r4 item 8 —
    python/biograph/tools/coverage.py:39-47,458 analog) must produce a
    byte-identical VCF body and identical features vs single-process."""
    import os

    from biograph_tpu.variants.coverage_tool import (
        _region_chunks,
        run_coverage_parallel,
    )
    from biograph_tpu.io.vcf import read_vcf

    LAMBDA = "/root/reference/datasets/lambdaToyData/benchmark"
    src = os.path.join(LAMBDA, "family_pcmp.vcf")
    vcf_in = tmp_path / "in.vcf"
    body = []
    for ln in open(src):
        if ln.startswith("#"):
            continue
        f = ln.split("\t")
        body.append(f"lambda\t{f[1]}\t.\t{f[3]}\t{f[4]}\t.\tPASS\t.\tGT\t./.\n")
    vcf_in.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tfather\n"
        + "".join(body)
    )
    recs = read_vcf(str(vcf_in))
    chunks = _region_chunks(recs, 3, safe_gap=3000)
    assert len(chunks) >= 2, chunks  # real fan-out on this input

    out1 = tmp_path / "serial.vcf"
    out2 = tmp_path / "parallel.vcf"
    f1 = tmp_path / "serial.npz"
    f2 = tmp_path / "parallel.npz"
    bg = os.path.join(LAMBDA, "father_lambda.bg")
    ref = os.path.join(LAMBDA, "ref_lambda")
    run_coverage_parallel(
        str(vcf_in), str(out1), bg, ref, n_workers=1, sample="father",
        features_out=str(f1),
    )
    run_coverage_parallel(
        str(vcf_in), str(out2), bg, ref, n_workers=3, sample="father",
        features_out=str(f2), safe_gap=3000,
    )
    b1 = [ln for ln in open(out1) if not ln.startswith("#")]
    b2 = [ln for ln in open(out2) if not ln.startswith("#")]
    assert b1 == b2
    a1, a2 = np.load(f1), np.load(f2)
    assert sorted(a1.files) == sorted(a2.files)
    for k in a1.files:
        assert (a1[k] == a2[k]).all(), k
