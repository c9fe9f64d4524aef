"""Pallas fold kernel vs the jnp fold oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from stark_tpu.fri import Fri, _INV2, _INV2_SHOUP
from stark_tpu.ops import fieldops as F
from stark_tpu.ops import pallas_kernels as PK
from stark_tpu.ops.fieldops import P, primitive_nth_root


def test_fold_pallas_matches_jnp():
    n = 4096
    fri = Fri(
        omega=primitive_nth_root(n),
        offset=3,
        domain_length=n,
        expansion_factor=4,
        num_colinearity_tests=4,
    )
    rng = np.random.default_rng(0)
    codeword = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
    alpha = int(rng.integers(0, 1 << 64, dtype=np.uint64))  # raw u64
    want = np.asarray(fri.fold_codeword(codeword, alpha, 0))

    a_red = alpha % P
    scalars = jnp.asarray(
        [a_red, int(F.shoup_precompute(a_red)), _INV2, _INV2_SHOUP],
        dtype=jnp.uint32,
    )
    got = np.asarray(
        PK.fold_pallas(
            codeword[: n // 2],
            codeword[n // 2 :],
            fri._plan.inv_x_mont(0),
            scalars,
            interpret=True,
        )
    )
    assert np.array_equal(got, want)
