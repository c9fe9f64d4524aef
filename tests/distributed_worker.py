"""Worker for the multi-process distributed test (test_distributed.py).

Each of N processes (1 virtual CPU device each) joins the cluster through
``initialize_distributed``, then:

1. runs a cross-process sharded NTT over the GLOBAL mesh (the shard this
   process owns is built locally with jax.make_array_from_callback; the
   four-step NTT's all_to_all actually crosses process boundaries), and
2. proves a small Fibonacci trace with the plain single-device prover
   (identical host program in every process — the SPMD control plane).

Prints one JSON line {ntt_sha, proof_sha} for the parent to compare
across workers and against a single-process reference.
"""

import hashlib
import json
import os
import sys

import numpy as np

import jax

from stark_tpu.parallel.distributed import global_mesh, initialize_distributed
from stark_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(allow_cpu=True)
initialize_distributed()
assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"]), (
    jax.process_count()
)

from jax.sharding import NamedSharding, PartitionSpec

from stark_tpu import StarkConfig, StarkProver
from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
from stark_tpu.ops.fieldops import P
from stark_tpu.parallel import pntt
from stark_tpu.parallel.mesh import AXIS

mesh = global_mesh()
D = mesh.devices.size

# -- 1. cross-process sharded NTT ------------------------------------------
n = 1 << 10
rng = np.random.default_rng(11)
x = rng.integers(0, P, size=n, dtype=np.uint32)  # same on every process
sharding = NamedSharding(mesh, PartitionSpec(AXIS))
xs = jax.make_array_from_callback(
    (n,), sharding, lambda idx: x[idx]
)
y = pntt.sharded_ntt(xs, mesh)
# Replicate so every process can fetch the full result.
y_rep = jax.jit(
    lambda a: a, out_shardings=NamedSharding(mesh, PartitionSpec())
)(y)
ntt_sha = hashlib.sha256(np.asarray(y_rep).tobytes()).hexdigest()

# -- 2. identical-control-plane proof --------------------------------------
cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)
proof = StarkProver(FibonacciAir(), cfg).prove(fibonacci_trace_mod_p(64))
proof_sha = hashlib.sha256(proof).hexdigest()

out = {"ntt_sha": ntt_sha, "proof_sha": proof_sha}

# -- 3. (optional) FULL distributed prover over the global mesh -------------
# STARK_DIST_T triggers a DistributedStarkProver run whose sharded NTT,
# sharded Merkle subtrees and sharded folds all span the process boundary;
# at T=512 / D=8 the shapes match the in-process D=8 test and the driver
# dryrun, so the graphs come warm from the persistent cache.
dist_T = int(os.environ.get("STARK_DIST_T", "0"))
if dist_T:
    from stark_tpu.parallel.pstark import DistributedStarkProver

    dcfg = StarkConfig(
        trace_length=dist_T, blowup=4, num_colinearity_tests=8
    )
    dproof = DistributedStarkProver(FibonacciAir(), dcfg, mesh).prove(
        fibonacci_trace_mod_p(dist_T)
    )
    out["dist_proof_sha"] = hashlib.sha256(dproof).hexdigest()

# -- 4. (optional) batch-sharded pipelined serving across processes ---------
# STARK_DIST_BATCH=B runs BatchStarkProver.prove_many over the GLOBAL mesh
# (batch axis sharded across the process boundary, two megas in flight) on
# B + B//2 traces so a padded partial batch is also exercised.  Shapes match
# test_batch.py::test_batch_mesh_mega_batch_sharded so graphs come warm
# from the persistent cache.
dist_B = int(os.environ.get("STARK_DIST_BATCH", "0"))
if dist_B:
    from stark_tpu.batch import BatchStarkProver

    bcfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=16)
    btraces = [fibonacci_trace_mod_p(64)] * (dist_B + dist_B // 2)
    bproofs = BatchStarkProver(
        FibonacciAir(), bcfg, dist_B, mesh=mesh
    ).prove_many(btraces, depth=2)
    out["batch_n"] = len(bproofs)
    out["batch_sha"] = hashlib.sha256(b"".join(bproofs)).hexdigest()

print(json.dumps(out))
sys.stdout.flush()
