"""Transliteration of reference `src/trace.rs`."""

_U64 = (1 << 64) - 1


class Trace:
    """trace.rs:4-50."""

    def __init__(self, trace):
        # trace.rs:10-15 — num_columns from row 0.
        self.trace = [list(r) for r in trace]
        self.num_columns = len(trace[0])

    def get_row(self, i):
        return self.trace[i] if i < len(self.trace) else None

    def get_col(self, j):
        return [r[j] for r in self.trace]

    def get(self, i, j):
        if i < len(self.trace) and j < len(self.trace[i]):
            return self.trace[i][j]
        return None

    def to_field_elements(self, field):
        # trace.rs:29-34 — `cell as u64` cast: i128 truncates/wraps to u64.
        return [
            [field.new_element(e & _U64) for e in r] for r in self.trace
        ]

    @staticmethod
    def fibonacci(length):
        # trace.rs:36-49.
        trace = []
        a, b = 1, 1
        for _ in range(length):
            trace.append([a])
            a, b = b, a + b
        return Trace(trace)
