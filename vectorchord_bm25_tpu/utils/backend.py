"""Backend liveness guard.

Single-chip serving machines reach their TPU through a network tunnel
(the ``axon`` PJRT plugin).  When the tunnel is down, the first device
query — ``jax.devices()`` anywhere in the process — blocks indefinitely
inside backend initialization, so a benchmark or driver entry would hang
rather than fail.  ``ensure_live_backend()`` probes backend init in a
*subprocess* with a timeout and, if the probe hangs or dies, forces this
process onto the CPU backend via ``jax.config`` **before** jax
initializes (the plugin ignores the ``JAX_PLATFORMS`` env var; only the
config route works).

This is an availability guard, not a perf knob: with a live TPU the
probe adds one subprocess backend init (~10-30 s, amortized by the
probe cache) and changes nothing else.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE_RESULT: str | None = None
_CACHE_PATH = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "tpu_bm25_backend_probe.json"
)
_CACHE_TTL_S = 300.0

_PROBE_SRC = (
    "import jax\n"
    "d = jax.devices()\n"
    "print(d[0].platform if d else 'none', flush=True)\n"
)


def _cached_probe() -> str | None:
    try:
        import json

        with open(_CACHE_PATH) as f:
            rec = json.load(f)
        if time.time() - rec["t"] <= _CACHE_TTL_S:
            return rec["platform"]
    except Exception:
        pass
    return None


def _store_probe(platform: str) -> None:
    try:
        import json

        tmp = _CACHE_PATH + f".{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"t": time.time(), "platform": platform}, f)
        os.replace(tmp, _CACHE_PATH)
    except Exception:
        pass


def probe_backend(timeout: float = 90.0, use_cache: bool = True) -> str:
    """Return the platform a fresh process would initialize ('tpu',
    'cpu', ...), or 'dead' if backend init hangs past ``timeout`` or
    crashes.  Runs at most once per process (cached in-module), and
    optionally shares a short-TTL on-disk cache across processes so
    back-to-back tools don't each pay the probe."""
    global _PROBE_RESULT
    if _PROBE_RESULT is not None:
        return _PROBE_RESULT
    if use_cache:
        hit = _cached_probe()
        if hit is not None:
            _PROBE_RESULT = hit
            return hit
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        platform = out.stdout.strip().splitlines()[-1] if (
            out.returncode == 0 and out.stdout.strip()
        ) else "dead"
    except (subprocess.TimeoutExpired, OSError):
        platform = "dead"
    _PROBE_RESULT = platform
    if use_cache:
        _store_probe(platform)
    return platform


def ensure_live_backend(timeout: float = 90.0) -> str:
    """Make sure jax in THIS process will come up on a live backend.

    If a subprocess probe shows backend init hanging (tunnel outage),
    force the CPU backend through ``jax.config`` before jax's first
    device query.  Returns the platform the process will use.  Must be
    called before anything touches jax devices; if jax is already
    initialized this is a no-op reporting the live platform.
    """
    import jax

    # Already initialized? (private but stable; fall back to config)
    try:
        from jax._src import xla_bridge

        if xla_bridge._backends:  # noqa: SLF001 - liveness introspection
            return jax.devices()[0].platform
    except Exception:
        pass

    platform = probe_backend(timeout=timeout)
    if platform == "dead":
        print(
            "backend probe: device backend init hung/crashed; forcing "
            "the CPU backend for this run",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return platform
