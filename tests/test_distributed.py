"""Multi-process distributed runtime: exercise
``parallel/distributed.initialize_distributed`` for real (round-1 review,
missing #3) — two OS processes, one virtual CPU device each, joined via
jax.distributed; a sharded NTT whose all_to_all crosses the process
boundary; proof bytes identical across processes and to a single-process
run.  Also: partial env configuration must raise, not silently degrade.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestEnvValidation:
    def test_partial_env_raises(self, monkeypatch):
        from stark_tpu.parallel.distributed import initialize_distributed

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
        with pytest.raises(RuntimeError, match="partial distributed"):
            initialize_distributed()

    def test_absent_env_is_single_process_noop(self, monkeypatch):
        from stark_tpu.parallel.distributed import initialize_distributed

        for var in (
            "JAX_COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES",
            "JAX_PROCESS_ID",
        ):
            monkeypatch.delenv(var, raising=False)
        initialize_distributed()  # must not raise, must not initialize


def _run_workers(nproc: int, devices_per_proc: int = 1, extra_env=None):
    """Launch nproc copies of distributed_worker.py joined via
    jax.distributed; returns their parsed JSON outputs."""
    port = _free_port()
    procs = []
    base_env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    for pid in range(nproc):
        env = dict(
            base_env,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={devices_per_proc} "
                "--xla_cpu_max_isa=AVX2"
            ),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            **(extra_env or {}),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py")],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


@pytest.mark.slow
def test_two_process_prove_and_collective():
    outs = _run_workers(2, devices_per_proc=1)

    # Both processes agree on the cross-process NTT and the proof bytes.
    assert outs[0] == outs[1]

    # Single-process reference for both artifacts.
    import hashlib

    from stark_tpu import StarkConfig, StarkProver
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
    from stark_tpu.ops import ntt as NTT
    from stark_tpu.ops.fieldops import P

    rng = np.random.default_rng(11)
    x = rng.integers(0, P, size=1 << 10, dtype=np.uint32)
    ref_ntt = hashlib.sha256(np.asarray(NTT.ntt(x)).tobytes()).hexdigest()
    assert outs[0]["ntt_sha"] == ref_ntt

    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)
    proof = StarkProver(FibonacciAir(), cfg).prove(fibonacci_trace_mod_p(64))
    assert outs[0]["proof_sha"] == hashlib.sha256(proof).hexdigest()


@pytest.mark.slow
def test_two_process_four_devices_sharded_prover():
    """2 OS processes x 4 virtual devices each = one 8-device global mesh:
    the FULL DistributedStarkProver (sharded four-step NTT, sharded Merkle
    subtrees, sharded folds) composes across the process boundary and its
    proof bytes equal the single-process single-device prover's (VERDICT
    r2 item 9).  T=512 -> N=2048 engages the sharded-tree path (the
    2*128*D floor) with graphs warm from the in-process D=8 tests."""
    import hashlib

    outs = _run_workers(
        2,
        devices_per_proc=4,
        extra_env={"STARK_DIST_T": "512", "STARK_DIST_BATCH": "8"},
    )
    assert outs[0] == outs[1]
    assert "dist_proof_sha" in outs[0]

    from stark_tpu import StarkConfig, StarkProver
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p

    cfg = StarkConfig(trace_length=512, blowup=4, num_colinearity_tests=8)
    proof = StarkProver(FibonacciAir(), cfg).prove(fibonacci_trace_mod_p(512))
    assert outs[0]["dist_proof_sha"] == hashlib.sha256(proof).hexdigest()

    # Cross-process batch-sharded serving: prove_many (B=8 over the 2x4
    # global mesh, padded partial chunk, depth-2 pipeline) emitted 12
    # proofs byte-identical to the single-device prover's.
    bcfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=16)
    want = StarkProver(FibonacciAir(), bcfg).prove(fibonacci_trace_mod_p(64))
    assert outs[0]["batch_n"] == 12
    assert outs[0]["batch_sha"] == hashlib.sha256(want * 12).hexdigest()
