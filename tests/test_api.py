import numpy as np
import pytest

from biograph_tpu.api import BioGraph, Sequence
from biograph_tpu.core import dna
from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.build.readmap_build import build_readmap


def test_sequence_ops():
    s = Sequence("ACGTT")
    assert str(s) == "ACGTT"
    assert len(s) == 5
    assert s.rev_comp() == "AACGT"
    assert s[1:3] == "CG"


@pytest.fixture(scope="module")
def sample_bgt(tmp_path_factory):
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=1500, dtype=np.uint8)
    L = 30
    starts = rng.integers(0, 1500 - L, size=300)
    codes = np.stack([genome[s : s + L] for s in starts])
    lens = np.full(300, L, np.int32)
    ss = build_seqset(codes, lens)
    rm = build_readmap(ss, codes, lens)
    d = tmp_path_factory.mktemp("bgt") / "sample.bgt"
    import os, json

    os.makedirs(d, exist_ok=True)
    ss.save(str(d / "seqset"))
    rm.save(str(d / "readmap"))
    (d / "metadata.json").write_text(json.dumps({"accession_id": "t"}))
    return str(d), genome, codes


def test_biograph_bgt_roundtrip(sample_bgt):
    path, genome, codes = sample_bgt
    bg = BioGraph(path)
    assert bg.num_reads == 300
    read = dna.codes_to_seq(codes[0])
    e = bg.find(read)
    assert e.valid
    assert str(e.sequence())[: len(read)] == read
    # navigation: pop then push recovers a sub-range
    popped = e.pop_front()
    assert popped.size == e.size - 1
    # coverage over a genome window
    cov = bg.seq_coverage(dna.codes_to_seq(genome[200:260]))
    assert cov.max() >= 1


def test_biograph_opens_reference_bg():
    bg = BioGraph(
        "/root/reference/datasets/lambdaToyData/benchmark/father_lambda.bg"
    )
    assert bg.seqset.n_entries == 98006
    assert bg.metadata.get("accession_id") == "father"
    e = bg.entry(0)
    s = str(e.sequence(20))
    assert bg.find(s).valid


def test_biograph_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        BioGraph(str(tmp_path / "nope"))
