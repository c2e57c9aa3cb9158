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


_CALLBACK_SUPPORT: dict[str, bool] = {}


def _callbacks_supported() -> bool:
    """Probe (once per backend) whether the platform can run host callbacks.

    Some PJRT plugins (e.g. the axon TPU tunnel) reject jax.debug.callback
    with UNIMPLEMENTED at execution time; without this probe an opted-in
    progress bar would crash the whole sampling run mid-scan.
    """
    import jax
    import jax.numpy as jnp

    platform = jax.default_backend()
    hit = _CALLBACK_SUPPORT.get(platform)
    if hit is not None:
        return hit

    def probe(x):
        jax.debug.callback(lambda v: None, x, ordered=False)
        return x + 1

    try:
        # scan_progress is typically called at trace time (inside a jitted
        # sampler); without the eval guard jit-of-jit would inline the probe
        # into the enclosing trace, embedding its callback there and
        # "succeeding" without ever executing.
        with jax.ensure_compile_time_eval():
            jax.block_until_ready(jax.jit(probe)(jnp.zeros(())))
    except Exception as e:
        # cache only the definitive PJRT "backend lacks host callbacks"
        # verdict; a transient failure (TPU busy, compile-service hiccup)
        # disables the bar for THIS call without poisoning the rest of the
        # process.  Do NOT also match on the word 'callback' — nearly every
        # probe failure mentions the callback custom call, transient or not.
        if "UNIMPLEMENTED" in str(e):
            _CALLBACK_SUPPORT[platform] = False
        return False
    _CALLBACK_SUPPORT[platform] = True
    return True


def scan_progress(num_samples: int, every: int = 50, message: str = "Sampling"):
    """Return a callable to fold into a scan body: emits host-side progress
    every ``every`` draws via jax.debug.callback.

    On backends without host-callback support the bar cannot exist; a
    one-line warning is printed and the returned hook is a no-op, so the
    run proceeds silently instead of dying inside the scan."""
    import jax

    if not _callbacks_supported():
        print(
            f"[hamiltorch_tpu] progress reporting needs host callbacks, which "
            f"backend '{jax.default_backend()}' does not support; sampling "
            f"will run without a progress bar.",
            file=sys.stderr,
        )
        return lambda n: None

    # The hook is built at TRACE time and the compiled program is cached, so
    # the bar cannot be constructed here: a second run reusing the cached
    # trace would reuse (and never reset) the first run's bar.  Instead the
    # closed-over holder lazily builds a fresh bar whenever the draw index
    # restarts (n not past the last seen — also what each checkpoint chunk's
    # chunk-local indices produce).  With ordered=False callbacks a rare
    # out-of-order delivery costs one spurious re-header, nothing more.
    state = {"bar": None, "last": -1}

    def emit(n):
        n = int(n)
        if state["bar"] is None or n <= state["last"]:
            state["bar"] = ProgressBar(message, num_samples)
        state["last"] = n
        state["bar"].update(n)

    def hook(n):
        jax.lax.cond(
            (n % every) == 0,
            lambda: jax.debug.callback(emit, n, ordered=False),
            lambda: None,
        )

    return hook
