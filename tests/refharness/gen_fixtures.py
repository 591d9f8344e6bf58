#!/usr/bin/env python3
"""Generate test fixture inputs and reference golden outputs.

Creates deterministic synthetic datasets in every input format the
reference accepts (hard-genotype gz text, Beagle-style GL gz text,
log-scale GL gz text, binary GP doubles, normal-scale GP gz text), then
runs the locally built reference binary (build_ref.sh) over a config
matrix mirroring examples/test.sh, storing outputs + an md5 manifest
under tests/fixtures/.  The fixtures are checked in; regeneration is
only needed when the config matrix changes.
"""

import gzip
import hashlib
import json
import os
import struct
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(os.path.dirname(HERE), "fixtures")
DATA = os.path.join(FIX, "data")
GOLD = os.path.join(FIX, "golden")
REF_BIN = os.path.join(HERE, "build", "ngsDist_ref")

N_IND = 20
N_SITES = 1200
SEED = 4242


def gz_bytes(payload: bytes) -> bytes:
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as fh:
        fh.write(payload)
    return buf.getvalue()


def write_gz(path: str, text: str) -> None:
    with open(path, "wb") as fh:
        fh.write(gz_bytes(text.encode()))


def make_data():
    os.makedirs(DATA, exist_ok=True)
    rng = np.random.default_rng(123)

    # Underlying "true" genotypes with population structure: two clusters.
    freqs = rng.uniform(0.05, 0.95, size=N_SITES)
    shift = rng.uniform(-0.3, 0.3, size=N_SITES)
    geno = np.zeros((N_SITES, N_IND), dtype=int)
    for i in range(N_IND):
        f = np.clip(freqs + (shift if i < N_IND // 2 else -shift), 0.02, 0.98)
        geno[:, i] = rng.binomial(2, f)
    miss = rng.random((N_SITES, N_IND)) < 0.05

    # 1) Hard genotypes, gz text, Beagle-like leading columns (chr, pos).
    lines = []
    for s in range(N_SITES):
        gs = ["-1" if miss[s, i] else str(geno[s, i]) for i in range(N_IND)]
        lines.append(f"chrSIM\t{s + 1}\t" + "\t".join(gs))
    write_gz(os.path.join(DATA, "gt.geno.gz"), "\n".join(lines) + "\n")

    # 2) Beagle GL (normal scale, max-normalized like ANGSD -doGlf 2),
    #    with a header line and marker/allele leading columns.
    def gl_triple(g, err=0.08):
        like = np.array([err, err, err])
        like[g] = 1.0
        noise = rng.uniform(0.5, 1.5, 3)
        like = like * noise
        like = like / like.max()
        return like

    hdr = "marker\tallele1\tallele2\t" + "\t".join(
        f"Ind{i}\tInd{i}\tInd{i}" for i in range(N_IND)
    )
    lines = [hdr]
    gl_vals = np.zeros((N_SITES, N_IND, 3))
    for s in range(N_SITES):
        cols = [f"chrSIM_{s + 1}", "0", "1"]
        for i in range(N_IND):
            if miss[s, i]:
                tri = np.array([1.0, 1.0, 1.0])
            else:
                tri = gl_triple(geno[s, i])
            gl_vals[s, i] = tri
            cols += [f"{v:.6f}" for v in tri]
        lines.append("\t".join(cols))
    write_gz(os.path.join(DATA, "gl.beagle.gz"), "\n".join(lines) + "\n")

    # 3) Log-scale GL text (3 cols per individual, no leading columns).
    lines = []
    for s in range(N_SITES):
        cols = []
        for i in range(N_IND):
            tri = np.log(np.maximum(gl_vals[s, i], 1e-300))
            cols += [f"{v:.6f}" for v in tri]
        lines.append("\t".join(cols))
    write_gz(os.path.join(DATA, "gl_log.geno.gz"), "\n".join(lines) + "\n")

    # 4) Binary GP doubles (normal scale, normalized posteriors, site-major).
    gp = np.zeros((N_SITES, N_IND, 3))
    for s in range(N_SITES):
        for i in range(N_IND):
            if miss[s, i]:
                gp[s, i] = 1.0 / 3.0
            else:
                tri = gl_triple(geno[s, i], err=0.05)
                gp[s, i] = tri / tri.sum()
    with open(os.path.join(DATA, "gp.bin"), "wb") as fh:
        fh.write(struct.pack(f"<{N_SITES * N_IND * 3}d", *gp.reshape(-1)))

    # 5) Text GP (normal scale) with chr/pos leading columns.
    lines = []
    for s in range(N_SITES):
        cols = [f"chr{1 if s < N_SITES // 2 else 2}", str(s + 1)]
        for i in range(N_IND):
            cols += [f"{v:.6f}" for v in gp[s, i]]
        lines.append("\t".join(cols))
    write_gz(os.path.join(DATA, "gp.geno.gz"), "\n".join(lines) + "\n")

    # Labels: edge cases — numeric-looking, trailing tab field, comments.
    labels = [f"sample_{i}" for i in range(N_IND)]
    labels[3], labels[7], labels[11] = "1", "22", "333"
    with open(os.path.join(DATA, "labels.txt"), "w") as fh:
        fh.write("# comment line\n")
        for j, lbl in enumerate(labels):
            fh.write(lbl + ("\textra_col\n" if j == 5 else "\n"))
            if j == 9:
                fh.write("\n")  # blank line, skipped by the reader
    with open(os.path.join(DATA, "labelsH.txt"), "w") as fh:
        fh.write("name\n")
        for lbl in labels:
            fh.write(lbl + "\n")

    # Positions: chr, pos, allele1, allele2; chromosome change midway.
    with open(os.path.join(DATA, "pos.txt"), "w") as fh:
        for s in range(N_SITES):
            chrom = "chr1" if s < N_SITES // 2 else "chr2"
            p = (s % (N_SITES // 2)) + 1
            fh.write(f"{chrom}\t{p}\t0\t1\n")
    with open(os.path.join(DATA, "posH.txt"), "w") as fh:
        fh.write("chr\tpos\tmajor\tminor\n")
        with open(os.path.join(DATA, "pos.txt")) as src:
            fh.write(src.read())


# Reference-scale workload: the exact shape of the reference's own test
# suite (examples/test.sh:9-10 — 24 individuals x 10,000 sites, seed
# 12345, Beagle header) with its label edge cases (examples/testA.labels:
# bare numerics 1/22/333/4444 and #/*/+/./- punctuation that must ride
# through the label reader verbatim).
N_IND24 = 24
N_SITES24 = 10000


def make_refscale_data():
    rng = np.random.default_rng(20260820)
    freqs = rng.uniform(0.05, 0.95, size=N_SITES24)
    geno = np.zeros((N_SITES24, N_IND24), dtype=int)
    for i in range(N_IND24):
        geno[:, i] = rng.binomial(2, freqs)
    miss = rng.random((N_SITES24, N_IND24)) < 0.03

    hdr = "marker\tallele1\tallele2\t" + "\t".join(
        f"Ind{i}\tInd{i}\tInd{i}" for i in range(N_IND24)
    )
    lines = [hdr]
    # Vectorized Beagle triples (max-normalized, like ANGSD -doGlf 2):
    # per-element loops at 240k triples would dominate fixture regen.
    like = np.full((N_SITES24, N_IND24, 3), 0.08)
    np.put_along_axis(like, geno[..., None], 1.0, axis=2)
    like *= rng.uniform(0.5, 1.5, like.shape)
    like[miss] = 1.0
    like /= like.max(axis=2, keepdims=True)
    for s in range(N_SITES24):
        cols = [f"chrSIM_{s + 1}", "0", "1"]
        cols += [f"{v:.6f}" for v in like[s].reshape(-1)]
        lines.append("\t".join(cols))
    write_gz(os.path.join(DATA, "gl24.beagle.gz"), "\n".join(lines) + "\n")

    with open(os.path.join(DATA, "labels24.txt"), "w") as fh:
        for suf in ("", "Sp_", "Sp-", "Sp#", "Sp.", None):
            if suf is None:
                fh.write("Sp*1\nSp+22\nSp*333\nSp+4444\n")
            else:
                for n in ("1", "22", "333", "4444"):
                    fh.write(f"{suf}{n}\n")


# Reference-scale config matrix: common args mirror examples/test.sh
# (--n_threads 10 --seed 12345), bootstrap at block 1 and block 10.
CONFIGS24 = [
    ("REF24", []),
    ("REF24_B5", ["--n_boot_rep", "5"]),
    ("REF24_B5B10", ["--n_boot_rep", "5", "--boot_block_size", "10"]),
]


def build_args24(extra, outpath):
    return (["--geno", "gl24.beagle.gz", "--probs",
             "--labels", "labels24.txt"] + list(extra) +
            ["--n_ind", str(N_IND24), "--n_sites", str(N_SITES24),
             "--n_threads", "10", "--seed", "12345", "--verbose", "1",
             "--out", outpath])


# Config matrix: (name, extra args). Common: --n_threads 4 --seed 4242
# --verbose 1 --n_ind 20 --n_sites 1200.
CONFIGS = [
    ("T", ["--geno", "gt.geno.gz"]),
    ("T_m0", ["--geno", "gt.geno.gz", "--evol_model", "0"]),
    ("T_m2", ["--geno", "gt.geno.gz", "--evol_model", "2"]),
    ("T_avg", ["--geno", "gt.geno.gz", "--avg_nuc_dist"]),
    ("T_tot", ["--geno", "gt.geno.gz", "--tot_sites", "1500"]),
    ("T_pdel", ["--geno", "gt.geno.gz", "--pairwise_del"]),
    ("T_b5", ["--geno", "gt.geno.gz", "--n_boot_rep", "5"]),
    ("T_b5B10", ["--geno", "gt.geno.gz", "--n_boot_rep", "5", "--boot_block_size", "10"]),
    ("T_b5B7", ["--geno", "gt.geno.gz", "--n_boot_rep", "5", "--boot_block_size", "7"]),
    ("T_labH", ["--geno", "gt.geno.gz", "--labelsH", "labelsH.txt"]),
    ("T_nolabels", ["--geno", "gt.geno.gz", "--nolabels"]),  # marker: drop --labels
    ("GL", ["--geno", "gl.beagle.gz", "--probs", "--pos", "pos.txt"]),
    ("GL_I", ["--geno", "gl.beagle.gz", "--probs", "--indep_geno"]),
    ("GL_pdel", ["--geno", "gl.beagle.gz", "--probs", "--pairwise_del"]),
    ("GL_b3B10", ["--geno", "gl.beagle.gz", "--probs", "--n_boot_rep", "3", "--boot_block_size", "10"]),
    ("GL_CG", ["--geno", "gl.beagle.gz", "--probs", "--call_geno"]),
    ("GL_CGf", ["--geno", "gl.beagle.gz", "--probs", "--call_geno", "--N_thresh", "0.3", "--call_thresh", "0.9"]),
    ("GL_avg", ["--geno", "gl.beagle.gz", "--probs", "--avg_nuc_dist", "--indep_geno"]),
    ("GLlog", ["--geno", "gl_log.geno.gz", "--log_scale"]),
    ("GLlog_I", ["--geno", "gl_log.geno.gz", "--log_scale", "--indep_geno", "--posH", "posH.txt"]),
    ("BIN", ["--geno", "gp.bin", "--probs"]),
    ("BIN_b5", ["--geno", "gp.bin", "--probs", "--n_boot_rep", "5"]),
    ("BIN_CG", ["--geno", "gp.bin", "--probs", "--call_geno"]),
    ("BIN_I_m0", ["--geno", "gp.bin", "--probs", "--indep_geno", "--evol_model", "0"]),
    ("GP", ["--geno", "gp.geno.gz", "--probs"]),
    ("GP_b3B10", ["--geno", "gp.geno.gz", "--probs", "--n_boot_rep", "3", "--boot_block_size", "10"]),
    ("GP_pdel_I", ["--geno", "gp.geno.gz", "--probs", "--pairwise_del", "--indep_geno"]),
    ("GP_CGf", ["--geno", "gp.geno.gz", "--probs", "--call_geno", "--N_thresh", "0.4", "--call_thresh", "0.95"]),
]


def build_args(name, extra, outpath):
    args = [
        "--n_ind", str(N_IND), "--n_sites", str(N_SITES),
        "--n_threads", "4", "--seed", str(SEED), "--verbose", "1",
        "--out", outpath,
    ]
    extra = list(extra)
    if "--nolabels" in extra:
        extra.remove("--nolabels")
    elif "--labelsH" not in extra:
        extra += ["--labels", "labels.txt"]
    return extra + args


def main():
    make_data()
    make_refscale_data()
    os.makedirs(GOLD, exist_ok=True)
    if not os.path.exists(REF_BIN):
        subprocess.run(["bash", os.path.join(HERE, "build_ref.sh")], check=True)
    manifest = {}
    jobs = [(name, lambda out, e=extra, n=name: build_args(n, e, out))
            for name, extra in CONFIGS]
    jobs += [(name, lambda out, e=extra: build_args24(e, out))
             for name, extra in CONFIGS24]
    for name, mk in jobs:
        outpath = os.path.join(GOLD, f"{name}.dist")
        args = mk(outpath)
        r = subprocess.run(
            [REF_BIN] + args, cwd=DATA, capture_output=True, text=True
        )
        if r.returncode != 0:
            print(f"FAILED {name}: {r.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        md5 = hashlib.md5(open(outpath, "rb").read()).hexdigest()
        manifest[name] = {"args": mk("{OUT}"), "md5": md5}
        print(f"{name}: {md5}")
    with open(os.path.join(FIX, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
