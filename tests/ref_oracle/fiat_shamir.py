"""Transliteration of reference `src/fiat_shamir.rs`."""

from .hashfn import Hash


class FiatShamir:
    """fiat_shamir.rs:4-26."""

    def __init__(self):
        self.transcript = bytearray()

    def absorb(self, data):
        # fiat_shamir.rs:15-17 — the only state mutation.
        self.transcript.extend(data)

    def challenge(self, field):
        # fiat_shamir.rs:19-25 — PURE: hashes the whole transcript; the
        # first 8 digest bytes become a raw u64 stored UNREDUCED.
        h = Hash.from_bytes(bytes(self.transcript))
        val = int.from_bytes(h.data[:8], "little")
        return field.new_element(val)
