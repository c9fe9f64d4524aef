"""Fiat-Shamir + proof stream contract tests (fiat_shamir.rs, stream.rs)."""

from stark_tpu.field import FiniteField
from stark_tpu.hashfn import Hash, hash_bytes
from stark_tpu.stream import (
    FieldElementObj,
    FieldElements,
    MerklePath,
    MerkleRoot,
    ProofStream,
)
from stark_tpu.transcript import FiatShamir

FIELD = FiniteField()


class TestFiatShamir:
    def test_challenge_is_pure(self):
        fs = FiatShamir()
        fs.absorb(b"root0")
        c1 = fs.challenge(FIELD)
        c2 = fs.challenge(FIELD)
        assert c1 == c2  # purity quirk the protocol depends on (SURVEY 3.6.2)

    def test_challenge_unreduced(self):
        # challenge = LE u64 of first 8 digest bytes, NOT reduced mod p
        fs = FiatShamir()
        fs.absorb(b"some transcript")
        digest = hash_bytes(b"some transcript")
        want = int.from_bytes(digest[:8], "little")
        assert fs.challenge(FIELD).value == want

    def test_absorb_advances(self):
        fs = FiatShamir()
        fs.absorb(b"a")
        c1 = fs.challenge(FIELD)
        fs.absorb(b"b")
        assert fs.challenge(FIELD) != c1


class TestProofStream:
    def roundtrip(self, objects):
        ps = ProofStream()
        for o in objects:
            ps.push(o)
        data = ps.serialize()
        back = ProofStream.deserialize(data, FIELD)
        assert list(back.objects) == list(objects)
        assert back.serialize() == data
        return data

    def test_roundtrip_all_variants(self):
        h = Hash.from_bytes(b"x")
        objects = [
            MerkleRoot(h),
            FieldElementObj(FIELD.new_element(42)),
            FieldElements(
                (FIELD.new_element(1), FIELD.new_element(998244352), FIELD.new_element(2**63))
            ),
            MerklePath((Hash.from_bytes(b"a"), Hash.from_bytes(b"b"))),
        ]
        data = self.roundtrip(objects)
        # exact wire bytes (stream.rs:35-64)
        want = bytearray()
        want += b"\x00" + h.data
        want += b"\x01" + (42).to_bytes(8, "little")
        want += b"\x02" + (3).to_bytes(8, "little")
        for v in [1, 998244352, 2**63]:
            want += v.to_bytes(8, "little")
        want += b"\x03" + (2).to_bytes(8, "little")
        want += Hash.from_bytes(b"a").data + Hash.from_bytes(b"b").data
        assert data == bytes(want)

    def test_fifo_pop(self):
        ps = ProofStream()
        ps.push(FieldElementObj(FIELD.new_element(1)))
        ps.push(FieldElementObj(FIELD.new_element(2)))
        assert ps.pop().element.value == 1
        assert ps.pop().element.value == 2
        assert ps.pop() is None

    def test_tolerant_deserialize(self):
        # truncated item skipped; unknown tag stops parsing (stream.rs:66-168)
        good = b"\x01" + (7).to_bytes(8, "little")
        truncated = b"\x00" + b"\x11" * 10  # root missing bytes
        unknown = b"\xff" + b"junk"
        ps = ProofStream.deserialize(good + truncated, FIELD)
        assert len(ps.objects) == 1
        ps2 = ProofStream.deserialize(good + unknown + good, FIELD)
        assert len(ps2.objects) == 1  # parsing stopped at unknown tag


class TestStreamRobustness:
    """Tolerant deserialization semantics (stream.rs:66-168): truncated
    items are skipped, an unknown tag ends parsing."""

    def _stream(self):
        s = ProofStream()
        s.push(MerkleRoot(Hash(bytes(range(32)))))
        s.push(FieldElementObj(FIELD.new_element(42)))
        s.push(FieldElements((FIELD.new_element(1), FIELD.new_element(2))))
        s.push(MerklePath((Hash(b"\x01" * 32), Hash(b"\x02" * 32))))
        return s

    def test_truncated_tail_object_skipped(self):
        data = self._stream().serialize()
        clipped = ProofStream.deserialize(data[:-5], FIELD)
        # The final MerklePath loses its last hash; earlier objects survive
        # intact.  (The leftover bytes of the cut hash keep being parsed as
        # garbage objects — the reference's loop does the same.)
        objs = list(clipped.objects)
        assert len(objs) >= 4
        assert isinstance(objs[3], MerklePath)
        assert len(objs[3].path) == 1

    def test_unknown_tag_ends_parsing(self):
        data = self._stream().serialize()
        poisoned = data[:33] + b"\xfe" + data[33:]
        parsed = ProofStream.deserialize(poisoned, FIELD)
        assert len(parsed) == 1  # only the leading MerkleRoot

    def test_random_garbage_never_crashes(self):
        import numpy as np

        rng = np.random.default_rng(0)
        for _ in range(200):
            blob = rng.integers(0, 256, size=rng.integers(0, 200)).astype(
                "uint8"
            ).tobytes()
            ProofStream.deserialize(blob, FIELD)  # must not raise

    def test_roundtrip_after_tolerant_parse(self):
        data = self._stream().serialize()
        again = ProofStream.deserialize(data, FIELD).serialize()
        assert again == data
