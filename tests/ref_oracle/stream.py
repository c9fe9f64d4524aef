"""Transliteration of reference `src/stream.rs` — proof stream + wire format."""

from .hashfn import Hash


class _Variant:
    __slots__ = ("payload",)

    def __init__(self, payload):
        self.payload = payload


class MerkleRootObj(_Variant):
    pass


class FieldElementObj(_Variant):
    pass


class FieldElementsObj(_Variant):
    pass


class MerklePathObj(_Variant):
    pass


class ProofObject:
    """stream.rs:8-14 — enum variants as thin wrappers."""

    MerkleRoot = MerkleRootObj
    FieldElement = FieldElementObj
    FieldElements = FieldElementsObj
    MerklePath = MerklePathObj


class ProofStream:
    """stream.rs:16-168."""

    def __init__(self, objects=None):
        self.objects = list(objects or [])

    def push(self, obj):
        # stream.rs:23-25.
        self.objects.append(obj)

    def pop(self):
        # stream.rs:27-33 — FIFO via remove(0).
        if not self.objects:
            return None
        return self.objects.pop(0)

    def serialize(self):
        # stream.rs:35-64 — tag byte then payload, all lengths/values u64 LE.
        out = bytearray()
        for obj in self.objects:
            if isinstance(obj, MerkleRootObj):
                out.append(0)
                out.extend(obj.payload.data)
            elif isinstance(obj, FieldElementObj):
                out.append(1)
                out.extend(int(obj.payload.value).to_bytes(8, "little"))
            elif isinstance(obj, FieldElementsObj):
                out.append(2)
                out.extend(len(obj.payload).to_bytes(8, "little"))
                for fe in obj.payload:
                    out.extend(int(fe.value).to_bytes(8, "little"))
            elif isinstance(obj, MerklePathObj):
                out.append(3)
                out.extend(len(obj.payload).to_bytes(8, "little"))
                for h in obj.payload:
                    out.extend(h.data)
            else:
                raise TypeError(type(obj))
        return bytes(out)

    @staticmethod
    def deserialize(data, field):
        # stream.rs:66-168 — tolerant: truncated items skipped, unknown tag
        # breaks.  (The count loops iterate min(count, bytes-present) times —
        # identical parse result to the reference's per-item bounds checks.)
        objects = []
        i = 0
        n = len(data)
        while i < n:
            tag = data[i]
            i += 1
            if tag == 0:
                if i + 32 <= n:
                    objects.append(MerkleRootObj(Hash(data[i : i + 32])))
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
                    fes = []
                    for _ in range(min(count, (n - i) // 8)):
                        val = int.from_bytes(data[i : i + 8], "little")
                        fes.append(field.new_element(val))
                        i += 8
                    objects.append(FieldElementsObj(fes))
            elif tag == 3:
                if i + 8 <= n:
                    count = int.from_bytes(data[i : i + 8], "little")
                    i += 8
                    path = []
                    for _ in range(min(count, (n - i) // 32)):
                        path.append(Hash(data[i : i + 32]))
                        i += 32
                    objects.append(MerklePathObj(path))
            else:
                break
        return ProofStream(objects)
