"""Per-phase timing + structured failure reasons.

The reference has no tracing or observability at all (SURVEY §5: the only
output is ``println!`` in main.rs:13 and the verifier's error prints in
fri.rs).  This module supplies the TPU-native equivalents:

* :class:`PhaseTimer` — wall-clock per phase (LDE / trace commit /
  compose / FRI commit / query / trace open), accumulated into a dict.
  ``StarkProver.prove`` and ``Fri.prove`` accept ``timer=`` and wrap
  their phases; bench.py passes one and emits the breakdown in its
  extras.  Phases measure HOST wall time per section — device work that
  was dispatched asynchronously is attributed to the phase that forces
  it (the fetch), which is exactly the control-plane view needed to
  chase host-side latency.  Library default is :data:`NULL_TIMER`
  (zero overhead, no accumulation).
* :func:`reason` — the verifier's failure taxonomy: prints the same
  human-readable reasons the reference prints (fri.rs:331-494) AND records
  a machine-readable (code, message) trail in ``LAST_REASONS`` for tests
  and callers.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

LAST_REASONS: list[tuple[str, str]] = []


def reset_reasons() -> None:
    LAST_REASONS.clear()


_MAX_REASONS = 256


def reason(code: str, message: str) -> None:
    """Record + print a verification failure reason (reference prints only).
    The trail is bounded so long-lived verifier processes cannot leak."""
    if len(LAST_REASONS) >= _MAX_REASONS:
        del LAST_REASONS[: _MAX_REASONS // 2]
    LAST_REASONS.append((code, message))
    print(message)


class PhaseTimer:
    def __init__(self):
        self.phases: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"total {total*1e3:.1f} ms"]
        for name, dt in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"  {name:<24} {dt*1e3:9.1f} ms  x{self.counts[name]}"
            )
        return "\n".join(lines)

    def ms(self) -> dict[str, float]:
        """{phase: milliseconds} rounded — the bench extras payload."""
        return {k: round(v * 1e3, 1) for k, v in self.phases.items()}


class _NullTimer(PhaseTimer):
    """Shared no-op timer: the library default when none is passed."""

    @contextmanager
    def phase(self, name: str):
        yield


NULL_TIMER = _NullTimer()
