"""Transliteration of reference `src/hash.rs` — the custom 256-bit
byte-oriented non-cryptographic hash, as straight per-byte Python.
"""

_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53)

_ROUND_CONSTANTS = (
    0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80,
    0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D, 0x9A, 0x2F,
    0x5E, 0xBC, 0x63, 0xC6, 0x97, 0x35, 0x6A, 0xD4,
    0xB3, 0x7D, 0xFA, 0xEF, 0xC5, 0x91, 0x39, 0x72,
)


def _rotate_left(byte, n):
    # hash.rs:55-57.
    return ((byte << n) | (byte >> (8 - n))) & 0xFF


def _sbox(byte):
    # hash.rs:88-94.
    return _rotate_left((byte * 251) & 0xFF, 1) ^ 0x63


def _mix_state(state):
    """hash.rs:59-86 — in-place mix round on the 32-byte state list."""
    for i in range(32):
        state[i] = _sbox(state[i])
    for i in range(8):
        base = i * 4
        t0, t1, t2, t3 = state[base : base + 4]
        state[base] = t0 ^ t1 ^ t3
        state[base + 1] = t0 ^ t2 ^ t3
        state[base + 2] = t0 ^ t1 ^ t2
        state[base + 3] = t1 ^ t2 ^ t3
    # Sequential in-place neighbor diffusion (hash.rs:77-81): state[i-1]
    # has already been updated when state[i] reads it.
    for i in range(32):
        nxt = (i + 1) % 32
        prv = 31 if i == 0 else i - 1
        state[i] = (state[i] + state[nxt] + state[prv]) & 0xFF
    for i in range(32):
        state[i] = (state[i] + _ROUND_CONSTANTS[i]) & 0xFF


class Hash:
    """hash.rs:1-51."""

    __slots__ = ("data",)

    def __init__(self, data):
        assert len(data) == 32
        self.data = bytes(data)

    def __eq__(self, other):
        return isinstance(other, Hash) and self.data == other.data

    def __hash__(self):
        return hash(self.data)

    @staticmethod
    def from_bytes(b):
        # hash.rs:7-30.
        state = [_PRIMES[i % 16] for i in range(32)]
        for chunk_idx in range(0, len(b), 32):
            chunk = b[chunk_idx : chunk_idx + 32]
            for i, byte in enumerate(chunk):
                pos = i % 32  # (i + chunk_idx*32) % 32 == i (hash.rs:16)
                v = (state[pos] + byte) & 0xFF
                v = _rotate_left(v, 3)
                state[pos] = v
                state[(pos + 7) % 32] ^= v
            _mix_state(state)
        for _ in range(8):
            _mix_state(state)
        return Hash(bytes(state))

    @staticmethod
    def from_field_elements(values):
        # hash.rs:32-35 — LE u64 concat of RAW values.
        b = b"".join(int(v).to_bytes(8, "little") for v in values)
        return Hash.from_bytes(b)

    @staticmethod
    def from_u64(value):
        # hash.rs:37-39.
        return Hash.from_bytes(int(value).to_bytes(8, "little"))

    @staticmethod
    def combine(left, right):
        # hash.rs:41-46.
        return Hash.from_bytes(left.data + right.data)

    def to_hex(self):
        return self.data.hex()
