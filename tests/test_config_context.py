"""Global-state + context coverage: init modes, the persistent-JIT-cache
wiring, option get/set, burble stream, dev timing, and the Context
engage/disengage lifecycle (reference: Source/GB_init.c, GB_Global.c,
GB_Context.c)."""

import os

import jax
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core import config as CFG
from graphblas_tpu.core import context as CTX


def test_init_blocking_and_finalize():
    gb.init(mode="blocking")
    assert CFG.GLOBAL.initialized and CFG.GLOBAL.blocking
    gb.finalize()
    assert not CFG.GLOBAL.initialized
    gb.init()  # restore nonblocking for other tests
    assert not CFG.GLOBAL.blocking


def test_init_explicit_cache_dir(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    d = tmp_path / "xla_cache"
    try:
        gb.init(compilation_cache_dir=str(d))
        assert d.is_dir()
        # cache is partitioned per (backend platform, host cpu-flags
        # hash): AOT blobs are machine-feature specific and
        # SIGILL/segfault when loaded on a different host (config.init)
        got = jax.config.jax_compilation_cache_dir
        assert got.startswith(str(d / "cpu"))
        base = os.path.basename(got)
        assert base == "cpu" or (base.startswith("cpu-")
                                 and len(base) == len("cpu-") + 8)
    finally:
        # leaving the cache pointed at tmp_path for the rest of the
        # process made every later >0.5s CPU compile AOT-export into it —
        # a path that segfaults intermittently in XLA:CPU (observed
        # killing full-suite runs at ~92% inside put_executable_and_time)
        jax.config.update("jax_compilation_cache_dir", prev)


def test_init_burble_env(monkeypatch):
    monkeypatch.setenv("GB_BURBLE", "1")
    gb.init()
    assert CFG.GLOBAL.burble
    CFG.GLOBAL.burble = False


def test_init_no_jit_cache_env(monkeypatch):
    monkeypatch.setenv("GB_NO_JIT_CACHE", "1")
    prev = jax.config.jax_compilation_cache_dir
    gb.init()  # must not touch the cache dir
    assert jax.config.jax_compilation_cache_dir == prev


def test_option_roundtrip_and_unknown():
    gb.set_option("chunk", 1234)
    assert gb.get_option("chunk") == 1234
    gb.set_option("chunk", 65536)
    with pytest.raises(KeyError):
        gb.set_option("no_such_option", 1)


def test_burble_printf_capture():
    lines = []
    old_printf, old_burble = CFG.GLOBAL.printf, CFG.GLOBAL.burble
    CFG.GLOBAL.printf = lines.append
    CFG.GLOBAL.burble = True
    try:
        CFG.burble("hello %d", 7)
        CFG.burble("plain")
    finally:
        CFG.GLOBAL.printf, CFG.GLOBAL.burble = old_printf, old_burble
    assert lines == ["[GB] hello 7", "[GB] plain"]
    CFG.burble("dropped when off")
    assert len(lines) == 2


def test_timed_accumulates():
    CFG.GLOBAL.timing.clear()
    with CFG.timed("unit"):
        pass
    with CFG.timed("unit"):
        pass
    assert CFG.GLOBAL.timing["unit"] >= 0.0
    CFG.GLOBAL.timing.clear()


def test_context_engage_disengage():
    c = CTX.Context(chunk=42, name="t")
    c.engage()
    assert CTX.current() is c
    c.disengage()
    assert CTX.current() is not c
    # disengage of a non-engaged context is a no-op
    c2 = CTX.Context(name="other")
    c2.disengage()


def test_context_nesting():
    outer = CTX.Context(name="outer").engage()
    with CTX.Context(name="inner") as inner:
        assert CTX.current() is inner
    assert CTX.current() is outer
    outer.disengage()


def test_context_default_world():
    CTX._tls.ctx = None
    ctx = CTX.current()
    assert ctx.name == "world"
    assert ctx.chunk == CFG.GLOBAL.chunk


def test_device_put_ctx():
    import numpy as np
    x = np.arange(4.0)
    # default context: pass-through
    CTX._tls.ctx = None
    y = CTX.device_put_ctx(x)
    assert y is x
    with CTX.Context(device=jax.devices()[0]):
        z = CTX.device_put_ctx(x)
        assert hasattr(z, "devices")
