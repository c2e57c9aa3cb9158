"""Throughput-reporting progress bar.

Parity with the reference's global-state progress bar (reference:
hamiltorch/util.py:25-89): time spent / remaining / bar / count /
traces-per-second, refresh-limited to 0.25 s, optional rejection column.

Inside a jitted scan there is no per-draw Python; ``scan_progress`` hooks
``jax.debug.callback`` to emit updates every ``every`` draws when the user
opts in (the callback costs a host sync, so it is off by default — the
chunked checkpoint runner reports per chunk instead).
"""

from __future__ import annotations

import sys
import time

_REFRESH = 0.25


class ProgressBar:
    def __init__(self, message: str, num_iters: int, iter_name: str = "Samples",
                 rejections: bool = False):
        if num_iters < 1:
            raise ValueError("num_iters must be a positive integer")
        self.num_iters = num_iters
        self.iter_name = iter_name
        self.rejections = rejections
        self.t0 = time.time()
        self.prev = 0.0
        self.width = len(str(num_iters))
        print(message)
        cols = f"Time spent  | Time remain.| Progress             | {iter_name.ljust(self.width * 2 + 1)} | {iter_name}/sec"
        if rejections:
            cols += " | Rejected Samples"
        print(cols)
        sys.stdout.flush()

    @staticmethod
    def _dhms(total_seconds: float) -> str:
        d, r = divmod(total_seconds, 86400)
        h, r = divmod(r, 3600)
        m, s = divmod(r, 60)
        return f"{int(d)}d:{int(h):02}:{int(m):02}:{int(s):02}"

    def _bar(self, i: int) -> str:
        filled = int(round(20 * i / self.num_iters))
        return "#" * filled + "-" * (20 - filled)

    def update(self, i: int, rejections=None):
        dur = time.time() - self.t0
        if dur - self.prev <= _REFRESH and i < self.num_iters - 1:
            return
        self.prev = dur
        rate = (i + 1) / dur
        line = (
            f"{self._dhms(dur)} | {self._dhms((self.num_iters - i) / rate)} | "
            f"{self._bar(i)} | {str(i).rjust(self.width)}/{self.num_iters} | {rate:,.2f}"
        )
        if rejections is not None:
            line += f" | {rejections:,.2f}"
        print(line + "   ", end="\r")
        sys.stdout.flush()

    def end(self, message: str | None = None):
        self.update(self.num_iters - 1)
        print()
        if message:
            print(message)


def scan_progress(num_samples: int, every: int = 50, message: str = "Sampling"):
    """Return a callable to fold into a scan body: emits host-side progress
    every ``every`` draws via jax.debug.callback."""
    import jax

    bar = ProgressBar(message, num_samples)

    def emit(n):
        bar.update(int(n))

    def hook(n):
        jax.lax.cond(
            (n % every) == 0,
            lambda: jax.debug.callback(emit, n, ordered=False),
            lambda: None,
        )

    return hook
