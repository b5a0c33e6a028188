"""Driver multichip-gate plumbing + multi-host init ordering.

Covers the two distributed-bootstrap contracts:
  * `__graft_entry__.dryrun_multichip` must self-bootstrap a virtual CPU mesh
    when the visible backend has too few devices (the driver runs under a
    pinned single-chip remote-TPU env) — the TPU-native analog of the
    reference's multi-device eval entry (reference: segmentation/dist_test.sh:1-7).
  * `maybe_initialize_distributed` must decide from the ENVIRONMENT and call
    `jax.distributed.initialize()` without first touching the XLA backend
    (reference contract: segmentation/denseclip/utils.py:102-107, minus the
    hardcoded localhost rendezvous).
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft_entry
from denseclip_vit_multimodal_tpu.parallel import mesh as mesh_lib


class TestScrubbedCpuEnv:
    def test_forces_cpu_platform_and_device_count(self):
        env = graft_entry._scrubbed_cpu_env(8)
        assert env["JAX_PLATFORMS"] == "cpu"
        assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]

    def test_replaces_existing_device_count_flag(self, monkeypatch):
        monkeypatch.setenv(
            "XLA_FLAGS",
            "--xla_dump_to=/tmp/d --xla_force_host_platform_device_count=2",
        )
        env = graft_entry._scrubbed_cpu_env(4)
        assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
        assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
        assert "--xla_dump_to=/tmp/d" in env["XLA_FLAGS"]

    def test_strips_sitecustomize_hooks_keeps_repo_root(self, tmp_path, monkeypatch):
        hook_dir = tmp_path / "hook"
        hook_dir.mkdir()
        (hook_dir / "sitecustomize.py").write_text("")
        clean_dir = tmp_path / "clean"
        clean_dir.mkdir()
        monkeypatch.setenv(
            "PYTHONPATH", os.pathsep.join([str(hook_dir), str(clean_dir)])
        )
        env = graft_entry._scrubbed_cpu_env(8)
        parts = env["PYTHONPATH"].split(os.pathsep)
        assert str(hook_dir) not in parts
        assert str(clean_dir) in parts
        assert parts[0] == graft_entry._REPO_ROOT

    def test_strips_axon_paths(self, monkeypatch):
        monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")
        env = graft_entry._scrubbed_cpu_env(8)
        assert "/root/.axon_site" not in env["PYTHONPATH"].split(os.pathsep)


class TestDryrunDispatch:
    def test_runs_locally_when_devices_suffice(self, monkeypatch):
        # Under the 8-device CPU test mesh, dryrun must NOT spawn a subprocess.
        calls = []
        monkeypatch.setattr(
            graft_entry, "_dryrun_local", lambda n: calls.append(n)
        )
        assert len(jax.devices()) >= 2
        graft_entry.dryrun_multichip(2)
        assert calls == [2]

    def test_reexecs_when_devices_missing(self, monkeypatch):
        # Ask for more devices than exist: must go through subprocess re-exec.
        import subprocess

        recorded = {}

        class FakeProc:
            returncode = 0

        def fake_run(cmd, cwd=None, env=None, **kw):
            recorded.update(cmd=cmd, cwd=cwd, env=env)
            return FakeProc()

        monkeypatch.setattr(subprocess, "run", fake_run)
        graft_entry.dryrun_multichip(len(jax.devices()) + 8)
        assert recorded["cwd"] == graft_entry._REPO_ROOT
        assert recorded["env"]["JAX_PLATFORMS"] == "cpu"
        assert "_dryrun_local" in recorded["cmd"][-1]

    def test_reexec_failure_propagates(self, monkeypatch):
        import subprocess

        class FakeProc:
            returncode = 3

        monkeypatch.setattr(
            subprocess, "run", lambda *a, **k: FakeProc()
        )
        with pytest.raises(RuntimeError, match="rc=3"):
            graft_entry.dryrun_multichip(len(jax.devices()) + 8)


class TestMaybeInitializeDistributed:
    def test_noop_without_coordinator(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: calls.append(1)
        )
        mesh_lib.maybe_initialize_distributed()
        assert calls == []

    def test_managed_environment_triggers_auto_detection(self, monkeypatch):
        """A multi-task Slurm/OMPI launch without JAX_COORDINATOR_ADDRESS
        must still call jax.distributed.initialize() (no args — jax's own
        cluster auto-detection), or two nodes silently train as independent
        single-process jobs."""
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("SLURM_STEP_NUM_TASKS", "2")  # srun step marker
        monkeypatch.setenv("SLURM_PROCID", "0")
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda *a, **k: calls.append((a, k)),
        )
        mesh_lib.maybe_initialize_distributed()
        assert calls == [((), {})]

    def test_allocation_without_task_rank_is_noop(self, monkeypatch):
        """SLURM_NTASKS>1 alone (a plain `python` inside an sbatch
        allocation, NOT one of N srun-launched tasks) must not initialize —
        it would wait forever for peers that don't exist.  The batch step
        itself carries SLURM_PROCID=0 and SLURM_STEP_NUM_TASKS=1, so the
        guard must key on the per-step task count."""
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("SLURM_PROCID", "0")  # batch step sets this too
        monkeypatch.setenv("SLURM_STEP_NUM_TASKS", "1")
        monkeypatch.setenv("SLURM_NTASKS", "2")
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: calls.append(1)
        )
        mesh_lib.maybe_initialize_distributed()
        assert calls == []

    def test_single_task_slurm_is_noop(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("SLURM_NTASKS", "1")
        monkeypatch.delenv("SLURM_STEP_NUM_TASKS", raising=False)
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: calls.append(1)
        )
        mesh_lib.maybe_initialize_distributed()
        assert calls == []

    def test_initialize_attempted_when_coordinator_set(self, monkeypatch):
        """initialize() must be reached from the env alone — the round-1 bug
        was querying jax.process_count() (which boots the backend
        single-process) before ever looking at the coordinator env."""
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: calls.append(1)
        )
        mesh_lib.maybe_initialize_distributed()
        assert calls == [1]

    def test_skips_when_already_initialized(self, monkeypatch):
        from jax._src import distributed as _dist

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setattr(_dist.global_state, "client", object())
        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda *a, **k: calls.append(1)
        )
        mesh_lib.maybe_initialize_distributed()
        assert calls == []

    def test_decision_does_not_touch_backend(self, monkeypatch):
        """Without a coordinator the function must return before any
        backend-initializing jax call (process_count/devices)."""
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)

        def boom(*a, **k):
            raise AssertionError("backend touched during the decision")

        monkeypatch.setattr(jax, "process_count", boom)
        monkeypatch.setattr(jax, "devices", boom)
        mesh_lib.maybe_initialize_distributed()
