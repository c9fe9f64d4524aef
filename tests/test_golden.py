"""Golden-vector regression tests: absolute bytes pinned.

The framework's determinism contract (hash bytes, challenges, serialized
proofs — reference src/hash.rs / fiat_shamir.rs / stream.rs semantics) must
never drift across refactors or engines.  These constants are additionally
re-derived from the INDEPENDENT reference transliteration in
tests/ref_oracle/ (see test_oracle_crosscheck.py::test_golden_constants_
reanchored), so they are anchored adversarially, not just by construction;
every optimized path (native C, device batch, distributed) is tested
elsewhere to match the same engine.
"""

import hashlib

import numpy as np

from stark_tpu.field import FiniteField
from stark_tpu.hashfn import Hash, hash_bytes
from stark_tpu.transcript import FiatShamir

GOLDEN_HASHES = {
    b"": "f2de8d1dbca64572c0310f32459054b28a30a5aa56ade96fa7d71fe77b536a66",
    b"abc": "6cf51dd336d3d989e7e7740318f9da802ae41cbea872add5a76c118cad12fd0a",
    bytes(range(64)): (
        "f2cef41febd30b54b1ae12377d0f36a8be0e37d2a9e2484bdc9479f33bfa5dc8"
    ),
}


def test_hash_golden_vectors():
    for data, want in GOLDEN_HASHES.items():
        assert hash_bytes(data).hex() == want


def test_field_elements_and_u64_golden():
    assert (
        Hash.from_field_elements([1, 2, 3]).to_hex()
        == "e360f49d2238e7c03427dba04af3a01629ba41ef4c1dfbc5af21a446ab09c6c5"
    )
    assert (
        Hash.from_u64((1 << 64) - 1).to_hex()
        == "365c81e3862e0214ddf0ca36108bcecedc3c10ce03e93121005db5bcdd958a17"
    )


def test_challenge_golden():
    fs = FiatShamir()
    fs.absorb(b"hello world")
    # Raw (unreduced) u64 challenge — fiat_shamir.rs:19-25 semantics.
    assert fs.challenge(FiniteField()).value == 5661645321078721431


def test_fri_proof_bytes_golden():
    from stark_tpu.fri import Fri
    from stark_tpu.ops import ntt as NTT
    from stark_tpu.ops.fieldops import primitive_nth_root
    from stark_tpu.stream import ProofStream

    n = 32
    fri = Fri(
        omega=primitive_nth_root(n),
        offset=3,
        domain_length=n,
        expansion_factor=4,
        num_colinearity_tests=2,
    )
    coeffs = np.zeros(n, dtype=np.uint32)
    coeffs[0] = 7
    codeword = NTT.coset_eval(coeffs, 3)
    fs, stream = FiatShamir(), ProofStream()
    fri.prove(codeword, fs, stream)
    proof = stream.serialize()
    assert len(proof) == 1219
    assert proof[:64].hex() == (
        "00fb7c5c1cde49c9fbbcb272c3e01985f04799d86118311fbcd2014c1179f6f6"
        "d30068c7106dba00d029d39a1d232b5cea31dda357fc9f74ae7d66e8a5f72515"
    )
    assert (
        hashlib.sha256(proof).hexdigest()
        == "1a3eb1d640cc53b4d8cd764064bd7de5708cc8df4a51e7eb23852989cacc370b"
    )


def test_stark_proof_bytes_golden():
    from stark_tpu import StarkConfig, StarkProver
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p

    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)
    proof = StarkProver(FibonacciAir(), cfg).prove(fibonacci_trace_mod_p(64))
    assert len(proof) == 15598
    assert (
        hashlib.sha256(proof).hexdigest()
        == "0fbe172505bfeaaefa39b0fe788e0e84c845958ff92fdc1330338bfc4d31335c"
    )
