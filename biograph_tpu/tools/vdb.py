"""VDB-lite: a local variant warehouse (columnar store + SQL-ish queries).

Counterpart of the reference's VDB (python/biograph/vdb/: VCF -> parquet ->
AWS Athena SQL over S3, ~4k LoC of boto3/pyathena plumbing).  This
environment has no cloud egress, so the warehouse is local: VCFs ingest into
compressed columnar .npz tables per sample, and queries run as vectorized
numpy filters.  The command surface mirrors `biograph vdb`:

    vdb ingest  <vcf> --db <dir> --sample <name>
    vdb list    --db <dir>
    vdb query   --db <dir> [--sample S] [--chrom C] [--pos-min N]
                [--pos-max N] [--min-qual Q] [--passing]
    vdb export  --db <dir> --sample S --out out.vcf
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List

import numpy as np

from biograph_tpu.io.vcf import VcfRecord, VcfWriter, read_vcf


def ingest(db: str, vcf_path: str, sample: str):
    os.makedirs(db, exist_ok=True)
    records = read_vcf(vcf_path)
    chrom = np.array([r.chrom for r in records])
    pos = np.array([r.pos for r in records], np.int64)
    ref = np.array([r.ref for r in records])
    alt = np.array([r.alt for r in records])
    qual = np.array([r.qual if r.qual is not None else np.nan for r in records])
    filt = np.array([r.filter for r in records])
    gt = np.array([str(r.fmt.get("GT", ".")) for r in records])
    np.savez_compressed(
        os.path.join(db, f"{sample}.npz"),
        chrom=chrom,
        pos=pos,
        ref=ref,
        alt=alt,
        qual=qual,
        filter=filt,
        gt=gt,
    )
    meta_path = os.path.join(db, "vdb.json")
    meta = json.load(open(meta_path)) if os.path.isfile(meta_path) else {}
    meta[sample] = {
        "source": os.path.abspath(vcf_path),
        "records": len(records),
        "ingested": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return len(records)


def list_samples(db: str) -> Dict:
    meta_path = os.path.join(db, "vdb.json")
    return json.load(open(meta_path)) if os.path.isfile(meta_path) else {}


def query(
    db: str,
    sample: str | None = None,
    chrom: str | None = None,
    pos_min: int | None = None,
    pos_max: int | None = None,
    min_qual: float | None = None,
    passing: bool = False,
) -> List[dict]:
    samples = [sample] if sample else sorted(list_samples(db))
    out = []
    for s in samples:
        p = os.path.join(db, f"{s}.npz")
        if not os.path.isfile(p):
            continue
        z = np.load(p, allow_pickle=False)
        mask = np.ones(len(z["pos"]), bool)
        if chrom:
            mask &= z["chrom"] == chrom
        if pos_min is not None:
            mask &= z["pos"] >= pos_min
        if pos_max is not None:
            mask &= z["pos"] <= pos_max
        if min_qual is not None:
            mask &= np.nan_to_num(z["qual"], nan=-1) >= min_qual
        if passing:
            mask &= z["filter"] == "PASS"
        for i in np.nonzero(mask)[0]:
            out.append(
                {
                    "sample": s,
                    "chrom": str(z["chrom"][i]),
                    "pos": int(z["pos"][i]),
                    "ref": str(z["ref"][i]),
                    "alt": str(z["alt"][i]),
                    "qual": float(z["qual"][i]),
                    "filter": str(z["filter"][i]),
                    "gt": str(z["gt"][i]),
                }
            )
    return out


def export(db: str, sample: str, out_path: str):
    rows = query(db, sample=sample)
    with VcfWriter(out_path, sample=sample) as w:
        for r in rows:
            w.write(
                VcfRecord(
                    chrom=r["chrom"],
                    pos=r["pos"],
                    ref=r["ref"],
                    alt=r["alt"],
                    qual=None if np.isnan(r["qual"]) else r["qual"],
                    filter=r["filter"],
                    fmt={"GT": r["gt"]},
                )
            )
    return len(rows)
