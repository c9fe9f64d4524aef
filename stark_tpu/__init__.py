"""stark_tpu — a TPU-native STARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`stark-rs` reference (a pure-Rust, single-threaded STARK proof system):
prime-field arithmetic over p = 998244353, NTT-based univariate polynomial
algebra, a byte-oriented commitment hash, Merkle trees, a Fiat-Shamir
transcript, a serializable proof stream, a FRI low-degree test, and a full
AIR->STARK composer — with every hot loop expressed as vectorized /
mesh-sharded TPU array programs.

Bit-exactness contract: hashes, transcripts, challenges and serialized
proof bytes reproduce the reference implementation exactly
(see reference src/hash.rs, src/fiat_shamir.rs, src/stream.rs, src/fri.rs).
"""

from stark_tpu.field import FiniteField, FieldElement, P
from stark_tpu.poly import Polynomial
from stark_tpu.hashfn import Hash
from stark_tpu.merkle import MerkleTree
from stark_tpu.transcript import FiatShamir
from stark_tpu.stream import ProofObject, ProofStream
from stark_tpu.fri import Fri, FriProof, QueryData
from stark_tpu.models.trace import Trace
from stark_tpu.stark import StarkConfig, StarkProver, StarkVerifier
from stark_tpu.batch import BatchStarkProver

__version__ = "0.1.0"

__all__ = [
    "P",
    "FiniteField",
    "FieldElement",
    "Polynomial",
    "Hash",
    "MerkleTree",
    "FiatShamir",
    "ProofObject",
    "ProofStream",
    "Fri",
    "FriProof",
    "QueryData",
    "Trace",
    "StarkConfig",
    "StarkProver",
    "StarkVerifier",
    "BatchStarkProver",
]
