"""BASELINE config 4 at full scale: top-10 seeds in parallel + FDR.

"Multi-seed run: refine top-10 PEnG seeds in parallel + FDR evaluation
with sampled negatives" (BASELINE.json configs[3]) on a 10k x 200 bp
planted set, 10 PWM seeds of mixed widths (8/10/12 — three (W, K)
groups), --EM --optimizeQ --FDR, order 2.

Writes CONFIG4.json at the repo root:
  * first-run wall clock (includes compiles) and warm-run wall clock
    (compile cache hot) — their gap bounds total compile cost; the
    seed-stacked kernel compiles ONCE PER (W, K) GROUP, not per seed;
  * per-group aggregate EM throughput (sum of member windows_scored over
    the group program's wall clock — the honest aggregate, cf.
    EMResult.group_seconds);
  * honest per-seed metrics (iteration-share seconds) and per-seed FDR
    AvRec.

Run on the TPU host:  python tools/config4_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SEQS = 10_000
SEQ_LEN = 200
MOTIFS = ["TGACTCAG", "CACGTGAC TT".replace(" ", ""), "GGGGCGGGGCCA"]  # W=8,10,12
N_SEEDS = 10


def build_inputs(tmpdir: str) -> tuple[str, str]:
    from bammmotif2_tpu.utils.alphabet import Alphabet
    from bammmotif2_tpu.utils.fasta import SequenceSet, write_fasta
    from bammmotif2_tpu.models import seeds as seeds_mod

    rng = np.random.default_rng(0)
    alphabet = Alphabet.from_type("STANDARD")
    codes = rng.integers(0, 4, (N_SEQS, SEQ_LEN)).astype(np.int8)
    for i, mot in enumerate(MOTIFS):
        enc = alphabet.encode(mot)
        rows = np.arange(i, N_SEQS, len(MOTIFS))  # interleave the 3 motifs
        pos = rng.integers(0, SEQ_LEN - len(enc), rows.size)
        keep = rng.random(rows.size) < 0.8
        for r, p, k in zip(rows, pos, keep):
            if k:
                codes[r, p : p + len(enc)] = enc
    sset = SequenceSet(
        codes=codes, lens=np.full(N_SEQS, SEQ_LEN, np.int32),
        headers=[f"s{i}" for i in range(N_SEQS)], alphabet=alphabet,
    )
    fasta = os.path.join(tmpdir, "pos.fasta")
    write_fasta(fasta, sset)

    # 10 seeds: perturbed PWM variants of the 3 planted motifs (PEnG-like
    # ranked seed list), mixed widths -> three (W, K) groups
    meme = os.path.join(tmpdir, "seeds.meme")
    with open(meme, "w") as fh:
        fh.write("MEME version 4\n\n")
        s = 0
        while s < N_SEEDS:
            mot = MOTIFS[s % len(MOTIFS)]
            pwm = seeds_mod.iupac_to_pwm(mot, soft=0.7)
            noise = rng.uniform(0.8, 1.25, pwm.shape) if s >= len(MOTIFS) else 1.0
            pwm = pwm * noise
            pwm = pwm / pwm.sum(axis=1, keepdims=True)
            fh.write(f"MOTIF seed{s + 1}\n")
            fh.write(
                f"letter-probability matrix: alength= 4 w= {pwm.shape[0]}"
                " nsites= 100\n"
            )
            for row in pwm:
                fh.write(" ".join(f"{p:.4f}" for p in row) + "\n")
            fh.write("\n")
            s += 1
    return fasta, meme


def one_run(fasta: str, meme: str, outdir: str) -> dict:
    from bammmotif2_tpu.cli import params_from_args, run_pipeline

    params = params_from_args([
        outdir, fasta, "--PWMFile", meme, "--maxPWM", str(N_SEEDS),
        "--EM", "--optimizeQ", "--FDR", "-q", "0.5", "--basename", "c4",
    ])
    t0 = time.perf_counter()
    out = run_pipeline(params)
    wall = time.perf_counter() - t0
    return dict(out=out, wall=wall)


def main() -> None:
    with tempfile.TemporaryDirectory() as td:
        fasta, meme = build_inputs(td)
        print("inputs built", flush=True)
        r1 = one_run(fasta, meme, os.path.join(td, "run1"))
        print(f"first run (cold compiles): {r1['wall']:.1f}s", flush=True)
        r2 = one_run(fasta, meme, os.path.join(td, "run2"))
        print(f"warm run: {r2['wall']:.1f}s", flush=True)

    out = r2["out"]
    em = out["em_results"]
    motifs = out["motifs"]
    groups: dict = {}
    for m, r in zip(motifs, em):
        groups.setdefault((m.W, m.K), []).append((m, r))
    group_rows = []
    for (W, K), members in groups.items():
        gsec = members[0][1].group_seconds or sum(r.seconds for _m, r in members)
        group_rows.append(dict(
            W=W, K=K, seeds=len(members),
            group_seconds=round(gsec, 4),
            agg_windows_per_sec=round(
                sum(r.windows_scored for _m, r in members) / gsec
            ),
            iterations=[r.iterations for _m, r in members],
        ))
    from bammmotif2_tpu.evaluation.prcurve import average_recall

    per_seed = [
        dict(
            name=m.name, W=m.W, iterations=r.iterations, ll=round(r.ll, 2),
            q=round(r.q, 4), seconds=round(r.seconds, 4),
            converged=r.converged,
        )
        for m, r in zip(motifs, em)
    ]
    fdr_rows = [
        dict(avrec_zoops=round(average_recall(f.zoops), 4),
             avrec_mops=round(average_recall(f.mops), 4))
        for f in out.get("fdr_results", [])
    ]
    artifact = dict(
        config="BASELINE configs[3]: top-10 seeds in parallel + FDR",
        n_seqs=N_SEQS, seq_len=SEQ_LEN, n_seeds=N_SEEDS,
        widths=sorted({m.W for m in motifs}),
        wall_first_run_s=round(r1["wall"], 1),
        wall_warm_run_s=round(r2["wall"], 1),
        compile_bound_s=round(r1["wall"] - r2["wall"], 1),
        em_groups=group_rows,
        em_per_seed=per_seed,
        fdr_per_seed=fdr_rows,
        note="seed-stacked kernel: one compile + one program per (W, K) "
             "group; per-seed seconds are iteration shares of the group "
             "wall clock (EMResult docs).  FDR runs as ONE fused device "
             "program per (W, K) group (fold scan + stacked EM + "
             "in-program negative sampling + device MOPS sweeps, "
             "evaluation/fdr.py); the warm wall is dominated by genuine "
             "fold-EM device compute (~300 iterations x 5 folds for the "
             "W=8 group) plus per-seed host sweep assembly — the r4 "
             "eager fold loop's ~0.5-1 s/op dispatch glue is gone "
             "(590 s -> ~32 s warm on the same tunnel)",
        timestamp=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    json.dump(artifact, open(os.path.join(REPO, "CONFIG4.json"), "w"), indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
