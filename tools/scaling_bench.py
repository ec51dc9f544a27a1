"""Measured multi-process weak-scaling of the sharded EM loop (CPU).

BASELINE.json's north star asks for >=80% seqs/s efficiency scaling from
1 to N hosts.  Real pod time is unavailable in this environment, so this
tool produces the best evidence runnable HERE: the SAME
jax.distributed + mesh + psum program timed at process_count 1 and 2 on
fixed sequences-per-shard (weak scaling), with each process pinned to
its own CPU core (taskset) so per-process compute resources are
identical across runs and the ratio isolates the framework's
distributed overheads (gloo collectives, multihost dispatch) rather
than core contention.

Caveats recorded in the artifact: CPU gloo over loopback is a far worse
transport than TPU ICI (the production path psums a <=330 KB count
tensor per iteration over ICI), and a 2-core host gives each process
exactly one core — so the measured efficiency is a LOWER bound on what
distinct TPU hosts would achieve for the non-collective overheads.

Usage:
    python tools/scaling_bench.py            # writes SCALING.json at repo root
    python tools/scaling_bench.py --worker … # internal (subprocess re-exec)

One EM configuration: K=2, W=8, n_per_device sequences x 50 bp per
device, 1 virtual CPU device per process, fixed 30 iterations (epsilon
0), gather path, warm time only (AOT compile excluded by run_em).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

N_PER_DEVICE = 4096
SEQ_LEN = 100
MOTIF = "TGACTCAG"
N_ITERS = 30
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(pid: int, nproc: int, port: int, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    from bammmotif2_tpu.parallel import distributed

    assert distributed.initialize() or nproc == 1, "distributed bring-up failed"
    assert jax.process_count() == nproc

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_em import planted_set

    from bammmotif2_tpu.models import seeds as seeds_mod
    from bammmotif2_tpu.models.background import BackgroundModel
    from bammmotif2_tpu.refinement.em import run_em
    from bammmotif2_tpu.utils.config import Params

    # weak scaling: data grows with the device count, per-shard size fixed
    n_total = N_PER_DEVICE * jax.device_count()
    sset = planted_set(n=n_total, l=SEQ_LEN, motif=MOTIF, q=0.8, seed=5,
                       noise=0.05)
    bg = BackgroundModel.from_sequence_set(sset, order=2)
    params = Params(EM=True, q=0.5, maxEMIterations=N_ITERS, epsilon=0.0,
                    use_pallas=False)
    mesh = distributed.auto_mesh(n_seeds=1)
    if mesh is None:  # single process, single device: unsharded run
        mesh = None

    def one_run():
        m = seeds_mod.motif_from_pwm(
            seeds_mod.iupac_to_pwm(MOTIF, soft=0.6), K=2,
            f_bg=sset.base_frequencies(),
        )
        return run_em(m, bg, sset, params, mesh=mesh)

    one_run()          # compile everything (AOT cache warm)
    res = one_run()    # timed: res.seconds excludes compile by construction

    if pid == 0:
        json.dump(
            dict(
                procs=nproc,
                devices=jax.device_count(),
                seqs=n_total,
                iterations=res.iterations,
                seconds=res.seconds,
                windows_scored=res.windows_scored,
                windows_per_sec=res.windows_per_sec,
                seqs_per_sec=n_total * res.iterations / res.seconds,
            ),
            open(out_path, "w"),
        )
    print(f"worker {pid}/{nproc}: {res.iterations} iters in "
          f"{res.seconds:.3f}s", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_point(nproc: int, tmpdir: str) -> dict:
    port = _free_port()
    out = os.path.join(tmpdir, f"scaling_{nproc}.json")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(pid % os.cpu_count()), sys.executable,
             os.path.abspath(__file__), "--worker", str(pid), str(nproc),
             str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    for p in procs:
        log, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{log[-3000:]}")
    return json.load(open(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5])
        return
    import tempfile

    n_cores = os.cpu_count() or 1
    proc_counts = [1, 2, 4, 8]
    repeats = 3  # min-of-N: the collective path is latency-bound and the
    # box is shared, so min is the right noise filter (perf-bench practice)
    points = []
    with tempfile.TemporaryDirectory() as td:
        for n in proc_counts:
            best = None
            for _ in range(repeats):
                p = run_point(n, td)
                if best is None or p["seconds"] < best["seconds"]:
                    best = p
            points.append(best)
            print(f"procs={n}: {best['seconds']:.3f}s (min of {repeats})",
                  flush=True)

    # weak scaling: per-shard work fixed.  On this 2-core box only the
    # 1->2 step has one pinned core per process; past that, processes
    # timeshare cores, so each point's IDEAL wall-clock is
    # ceil(n/cores) x t1 (pure compute timesharing) and everything above
    # it is distributed overhead (gloo collectives + multihost dispatch).
    t1 = points[0]["seconds"]
    eff = t1 / points[1]["seconds"]
    rows = []
    for p in points:
        n = p["procs"]
        contention = -(-n // n_cores)
        ideal = contention * t1
        over_ms = max(p["seconds"] - ideal, 0.0) / N_ITERS * 1e3
        rows.append(dict(
            procs=n, procs_per_core=contention,
            ideal_seconds=round(ideal, 4),
            overhead_ms_per_iter=round(over_ms, 3),
            contention_adjusted_efficiency=round(ideal / p["seconds"], 4),
            oversubscribed=contention > 1,
        ))
    artifact = dict(
        config=dict(
            kind="weak scaling, 1 virtual CPU device per process; pinned "
                 "cores up to the core count, timesharing past it "
                 "(overhead model separates contention from collectives)",
            cores=n_cores,
            seqs_per_device=N_PER_DEVICE, seq_len=SEQ_LEN, K=2, W=len(MOTIF),
            iterations=N_ITERS, path="gather (CPU)",
            transport="gloo over loopback",
        ),
        points=points,
        overhead_model=rows,
        efficiency_1_to_2_procs=round(eff, 4),
        distributed_overhead_ms_per_iter=round(
            rows[1]["overhead_ms_per_iter"], 3
        ),
        note="CPU/gloo lower bound for the framework's distributed "
             "overheads; the TPU production path psums a <=330 KB count "
             "tensor per EM iteration over ICI, so cross-host efficiency "
             "there is expected to be >= this bound (BASELINE >=80% bar). "
             "The pinned 1->2 step is the only clean point this 2-core "
             "box allows; 4- and 8-process points (oversubscribed=true) "
             "validate that the SPMD program runs correctly at higher "
             "process counts, but their overhead is dominated by "
             "allreduce convoying under core timesharing (every "
             "participant must be scheduled per collective), a scheduling "
             "artifact distinct hosts do not have — treat them as loose "
             "upper bounds, not a collective-cost trend.",
        timestamp=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    out_path = os.path.join(REPO, "SCALING.json")
    json.dump(artifact, open(out_path, "w"), indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
