"""Serializable proof stream.  Byte-exact contract: reference src/stream.rs.

Wire format (stream.rs:35-64): per object a tag byte then payload —
  0: MerkleRoot   — 32 raw bytes
  1: FieldElement — u64 LE
  2: FieldElements — u64 LE count, then values as u64 LE
  3: MerklePath   — u64 LE count, then 32-byte hashes
Deserialization is tolerant: truncated items are skipped, unknown tags end
parsing (stream.rs:66-168).  Pop is FIFO (stream.rs:27-33).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from stark_tpu.field import FieldElement, FiniteField
from stark_tpu.hashfn import Hash


@dataclass(frozen=True)
class MerkleRoot:
    hash: Hash


@dataclass(frozen=True)
class FieldElementObj:
    element: FieldElement


@dataclass(frozen=True)
class FieldElements:
    elements: tuple


@dataclass(frozen=True)
class MerklePath:
    path: tuple


class ProofObject:
    """Namespace mirroring the reference's ProofObject enum variants."""

    MerkleRoot = MerkleRoot
    FieldElement = FieldElementObj
    FieldElements = FieldElements
    MerklePath = MerklePath


def raw_field_elements(values) -> bytes:
    """Wire bytes of ONE FieldElements object (tag 2) from a 1-D array or
    sequence of ints (stream.rs:45-52 layout)."""
    import numpy as np

    arr = np.asarray(values, dtype=np.uint64)
    return (
        b"\x02"
        + int(arr.shape[0]).to_bytes(8, "little")
        + arr.astype("<u8").tobytes()
    )


def raw_merkle_path(sib, q: int) -> bytes:
    """Wire bytes of ONE MerklePath object (tag 3) for query ``q`` from a
    fetched (L, k, 32) u8 sibling-digest array (stream.rs:53-63 layout)."""
    import numpy as np

    L = sib.shape[0]
    return (
        b"\x03"
        + int(L).to_bytes(8, "little")
        + np.ascontiguousarray(sib[:, q, :]).tobytes()
    )


class _Raw(bytes):
    """Pre-serialized wire segment (one or more whole objects) pushed by
    the prover's bulk emit paths — building one bytes object per
    authentication path instead of one Hash per tree level is ~10x less
    host work at emit time.  Serialization output is byte-identical;
    prover-side streams are never popped, so the object view is unused."""


class ProofStream:
    def __init__(self, objects=None):
        self.objects = deque(objects or [])

    def push(self, obj) -> None:
        self.objects.append(obj)

    def push_raw(self, data: bytes) -> None:
        """Append an already-serialized segment (must be whole objects in
        wire format — the caller is trusted; tests pin byte-equality with
        the object path)."""
        self.objects.append(_Raw(data))

    def pop(self):
        return self.objects.popleft() if self.objects else None

    def __len__(self) -> int:
        return len(self.objects)

    def serialize(self) -> bytes:
        out = bytearray()
        for obj in self.objects:
            if isinstance(obj, _Raw):
                out.extend(obj)
            elif isinstance(obj, MerkleRoot):
                out.append(0)
                out.extend(obj.hash.data)
            elif isinstance(obj, FieldElementObj):
                out.append(1)
                out.extend(int(obj.element.value).to_bytes(8, "little"))
            elif isinstance(obj, FieldElements):
                out.append(2)
                out.extend(len(obj.elements).to_bytes(8, "little"))
                for fe in obj.elements:
                    value = fe.value if isinstance(fe, FieldElement) else int(fe)
                    out.extend(int(value).to_bytes(8, "little"))
            elif isinstance(obj, MerklePath):
                out.append(3)
                out.extend(len(obj.path).to_bytes(8, "little"))
                for h in obj.path:
                    out.extend(h.data)
            else:
                raise TypeError(f"unknown proof object {type(obj)}")
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes, field: FiniteField) -> "ProofStream":
        objects = []
        i = 0
        n = len(data)
        while i < n:
            tag = data[i]
            i += 1
            if tag == 0:
                if i + 32 <= n:
                    objects.append(MerkleRoot(Hash(data[i : i + 32])))
                    i += 32
            elif tag == 1:
                if i + 8 <= n:
                    val = int.from_bytes(data[i : i + 8], "little")
                    objects.append(FieldElementObj(field.new_element(val)))
                    i += 8
            elif tag == 2:
                if i + 8 <= n:
                    count = int.from_bytes(data[i : i + 8], "little")
                    i += 8
                    # Clamp iterations to the bytes present: identical parse
                    # result to the reference's bounds-checked loop, without
                    # letting a hostile 2^64 count spin the parser (DoS).
                    count = min(count, (n - i) // 8)
                    fes = []
                    for _ in range(count):
                        val = int.from_bytes(data[i : i + 8], "little")
                        fes.append(field.new_element(val))
                        i += 8
                    objects.append(FieldElements(tuple(fes)))
            elif tag == 3:
                if i + 8 <= n:
                    count = int.from_bytes(data[i : i + 8], "little")
                    i += 8
                    count = min(count, (n - i) // 32)
                    path = []
                    for _ in range(count):
                        path.append(Hash(data[i : i + 32]))
                        i += 32
                    objects.append(MerklePath(tuple(path)))
            else:
                break
        return ProofStream(objects)
