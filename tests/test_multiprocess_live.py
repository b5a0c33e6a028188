"""LIVE 2-process jax.distributed test — the multi-host path actually runs.

Round-2 verdict: `maybe_initialize_distributed` and the multi-process branch
of `shard_batch` had never executed anywhere (only monkeypatch unit tests).
Here two REAL processes (4 virtual CPU devices each) rendezvous through a
coordinator, form one 8-device global mesh with cross-process Gloo
collectives, and run one data-parallel train step — the execution shape the
reference reaches with mp.spawn + NCCL
(reference: segmentation/train_denseclip.py:1654-1657,
denseclip/utils.py:102-107).  A third, single-process 8-device run of the
same global step pins numerical equivalence between the launch shapes.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local: int, coord=None, nproc=None, rank=None) -> dict:
    """Clean CPU env for a worker subprocess (axon sitecustomize stripped)."""
    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as graft

    env = graft._scrubbed_cpu_env(n_local)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    # share the persistent compile cache with the main suite
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_compile_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    if coord is not None:
        env["JAX_COORDINATOR_ADDRESS"] = coord
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(rank)
    return env


def _parse_loss(
    stdout: str, want_rank: int, want_nproc: int, tag: str = "MPLIVE "
) -> float:
    for line in stdout.splitlines():
        if line.startswith(tag):
            fields = dict(kv.split("=", 1) for kv in line.split()[1:])
            assert int(fields["rank"]) == want_rank, line
            assert int(fields["nproc"]) == want_nproc, line
            return float(fields["loss"])
    raise AssertionError(f"no {tag!r} line in output:\n{stdout}")


def test_two_process_train_step_matches_single_process(tmp_path):
    coord = f"localhost:{_free_port()}"

    def env_for(rank):
        env = _worker_env(4, coord=coord, nproc=2, rank=rank)
        # shared dir -> the workers also exercise the COLLECTIVE orbax
        # save/restore path (all processes must call save; a rank-0-only
        # save of multi-host replicated arrays would hang)
        env["MPLIVE_CKPT_DIR"] = str(tmp_path)
        return env

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER],
            cwd=REPO_ROOT,
            env=env_for(r),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"MPLIVE_CKPT rank={r} ok" in out, (
            f"collective checkpoint save did not complete on rank {r}:\n{out}"
        )
    losses = [_parse_loss(out, r, 2) for r, out in enumerate(outs)]

    # both ranks fetch the same replicated global loss
    assert losses[0] == losses[1], losses

    # single-process 8-device run of the same global step
    ref = subprocess.run(
        [sys.executable, WORKER],
        cwd=REPO_ROOT,
        env=_worker_env(8),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=540,
    )
    assert ref.returncode == 0, f"single-process reference failed:\n{ref.stdout}"
    ref_loss = _parse_loss(ref.stdout, 0, 1)
    # cross-process Gloo reductions may re-associate vs the in-process ring
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)

    # Pipelined step: stage hops (ppermute) crossed the process boundary
    # ({pipe: 2, data: 4} puts one stage per process); both ranks agree and
    # match the single-process pipelined run of the same global step.
    losses_pp = [
        _parse_loss(out, r, 2, tag="MPLIVE_PP ") for r, out in enumerate(outs)
    ]
    assert losses_pp[0] == losses_pp[1], losses_pp
    ref_pp = _parse_loss(ref.stdout, 0, 1, tag="MPLIVE_PP ")
    np.testing.assert_allclose(losses_pp[0], ref_pp, rtol=1e-5)
