"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware. XLA_FLAGS must be set before jax initializes
its backends; the platform override must use jax.config (the axon TPU plugin
ignores the JAX_PLATFORMS env var).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["VOXELTPU_PLATFORM"] = "cpu"  # subprocess servers follow suit

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles the same CPU-interpret
# kernels every run (~17 min cold); cached executables cut that several-
# fold. CPU-only — bench.py deliberately avoids a persistent cache on the
# device backend (a degraded session's executables must not be reused).
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
os.environ["VOXELTPU_COMPCACHE"] = _cache_dir  # subprocess servers too

# PJRT-CPU `executable.serialize()` SEGFAULTS for the big v4-family
# programs when they compile late in the suite (~100 live executables in
# the process; reproducible with a fresh cache and with zstandard
# removed, so it is the serialize itself, not compression — standalone
# runs of the same tests are fine; round 4 also reproduced the
# DESERIALIZE direction as a cache-READ crash on _primary_retry4).
# Exclude that family from persistent-cache WRITES: never serialized ->
# never crashes, and reads simply miss instead of killing the run.
#
# STRUCTURAL detection (round 5 — replaces a jit-name list that rotted
# on rename): every crasher embeds the v4 self-serving Pallas march,
# whose `pl.when` service branches lower (interpret mode) to HLO
# `conditional` ops — absent from the whole safe v3/v1/v2 tier
# (measured: the tiny v3 _render_frame and v4 _frame_fused4 programs
# are both ~2.2 MB of HLO proto, so SIZE does not discriminate; the
# opcode-set diff is exactly {conditional, dynamic-slice}). The rule:
# skip writes for modules that are big AND carry a conditional. Big
# benign lax.cond users are also skipped — a recompile, not a failure.
from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time


_COND_RE = None


def _embeds_kernel_conditional(executable):
    global _COND_RE
    try:
        m = executable.hlo_modules()[0]
        proto = m.as_serialized_hlo_module_proto()
        if len(proto) <= (256 << 10):
            return False  # small programs never hit the serializer bug
        if _COND_RE is None:
            import re

            # opcode-anchored: `%x = ty conditional(` — metadata
            # op_name strings don't match this shape (verified: the
            # v3-vs-v4 opcode-set diff is exactly {conditional,
            # dynamic-slice}; proto BYTES also contain the substring
            # for safe v3 modules, so the text scan is required)
            _COND_RE = re.compile(r"=\s+\S+\s+conditional\(")
        return _COND_RE.search(m.to_string()) is not None
    except Exception:
        return True  # can't inspect -> don't risk the serializer


def _safe_put(cache_key, module_name, executable, backend, compile_time):
    if _embeds_kernel_conditional(executable):
        return None
    return _orig_put(cache_key, module_name, executable, backend,
                     compile_time)


_cc.put_executable_and_time = _safe_put

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live executables after every test module.

    The PJRT-CPU client segfaults inside backend_compile_and_load when
    compiling the big v4-family programs late in a full-suite run
    (reproduced 3/3: tests/test_wavefront4.py::
    test_v4_grouped_service_matches_chain crashes at ~88% of the suite,
    passes standalone and in small subsets — accumulated live-executable
    state, the same failure family as the serialize crash above).
    Clearing the pjit caches between modules keeps each module's live
    set no bigger than its standalone run, which is proven stable; the
    persistent compilation cache makes the re-compiles disk loads."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
