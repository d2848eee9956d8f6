"""bench.py driver contract: ONE parseable JSON line with the required
keys, emitted exactly once — including under the watchdog/partial path
(the tunneled TPU client can wedge mid-run; the driver must still get a
result line, see bench.py `_emit`/`_watchdog_fire`)."""

import importlib
import io
import json
import sys
from contextlib import redirect_stdout

import pytest

pytestmark = pytest.mark.quick

REQUIRED_KEYS = {"metric", "value", "unit", "vs_baseline", "configs"}


@pytest.fixture()
def bench_mod():
    """Fresh bench module per test (module-level emit-once state)."""
    sys.modules.pop("bench", None)
    mod = importlib.import_module("bench")
    yield mod
    sys.modules.pop("bench", None)


def test_emit_full_contract(bench_mod):
    bench_mod._PARTIAL["configs"]["mobilenetv2_lite"] = {
        "infer_b1_ms": 2.0,
        "train_images_per_sec_per_chip": 400.0,
    }
    bench_mod._PARTIAL.update(peak=197e12, n_chips=1, device="test")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_mod._emit()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert REQUIRED_KEYS <= set(out)
    assert out["value"] == 2.0
    # vs_baseline = reference 23 ms / ours
    assert out["vs_baseline"] == pytest.approx(11.5)
    assert "watchdog_timeout" not in out


def test_checkpoint_reemission(bench_mod):
    """Round-3 failure mode (driver kill, rc=124, nothing on stdout):
    every completed section re-emits the FULL line — the driver reads
    the tail and the last line wins. After the final emit, checkpoints
    are suppressed."""
    bench_mod._PARTIAL["configs"]["mobilenetv2_lite"] = {"infer_b1_ms": 2.0}
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_mod._checkpoint("headline:mobilenetv2_lite")
        bench_mod._PARTIAL["configs"]["xception"] = {"infer_b1_ms": 4.0}
        bench_mod._checkpoint("headline:xception")
        bench_mod._emit()
        bench_mod._checkpoint("late")  # suppressed after final emit
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 3
    for line in lines:
        out = json.loads(line)
        assert REQUIRED_KEYS <= set(out)
    assert json.loads(lines[0])["sections_done"] == "headline:mobilenetv2_lite"
    assert "xception" in json.loads(lines[1])["configs"]
    # the LAST line (what the driver records) is the final full result
    assert "sections_done" not in json.loads(lines[2])
    assert json.loads(lines[2])["value"] == 2.0


def test_exc_line_truncates_xla_dump(bench_mod):
    exc = RuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory\n" + "alloc line\n" * 100
    )
    line = bench_mod._exc_line(exc)
    assert "\n" not in line
    assert len(line) < 200
    assert "RESOURCE_EXHAUSTED" in line


def test_watchdog_default_fits_driver_budget(bench_mod):
    """Rounds 3 AND 4 were lost to the driver's own deadline (rc=124,
    parsed:null): only a clean rc=0 exit before it counts. VERDICT r4 #1
    prescribes a default at or under 20 minutes; main() must actually use
    the module constant (asserted numerically, not as a source literal —
    ADVICE r4)."""
    import inspect

    assert bench_mod.WATCHDOG_DEFAULT_MIN <= 20.0
    src = inspect.getsource(bench_mod.main)
    assert "WATCHDOG_DEFAULT_MIN" in src


def test_budget_ok_gates_and_records_skips(bench_mod):
    """The per-section budgeter (VERDICT r4 #1b): a section whose
    cold-cache estimate exceeds the remaining budget is skipped, the skip
    is recorded in the emitted JSON, and a section that fits is
    admitted."""
    import io
    import time as _time
    from contextlib import redirect_stdout

    bench_mod._T0[0] = _time.time()
    bench_mod._DEADLINE[0] = _time.time() + 3 * 60  # 3 min left
    assert bench_mod._budget_ok("cheap", 1.0) is True
    assert bench_mod._budget_ok("expensive", 10.0) is False
    assert bench_mod._SKIPPED == ["expensive"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_mod._emit()
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["sections_skipped"] == ["expensive"]
    assert "elapsed_min" in out


def test_emit_partial_and_idempotent(bench_mod):
    """Watchdog path: no completed entries at all still yields a valid
    line (value null), flagged partial; a second emit is a no-op."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_mod._emit(partial=True)
        bench_mod._emit()  # must not print a second line
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert out["watchdog_timeout"] is True


def test_adaptive_budget_scale(bench_mod):
    """Warm-cache adaptivity (round 5): run 4 showed a fully-warm rig
    completes sections at ~0.64x their cold estimates yet the raw gates
    still budgeted cold — skipping sections that fit. The scale must (a)
    stay 1.0 until two sections have started, (b) track the observed
    actual/estimate ratio of COMPLETED sections, (c) clamp to
    [_SCALE_MIN, 1.0], and (d) let _budget_ok admit a section the
    unscaled estimate would reject."""
    import time as _time

    assert bench_mod._est_scale() == 1.0
    t = _time.time()
    # two completed 4-min-estimate sections that actually took 2 min each
    bench_mod._STARTED[:] = [("s1", 4.0, t - 300), ("s2", 4.0, t - 180),
                             ("s3", 4.0, t - 60)]
    # elapsed over completed = (t-60)-(t-300) = 4 min vs est 8 -> 0.5
    assert bench_mod._est_scale() == pytest.approx(0.5)

    # clamping: absurdly fast sections floor at _SCALE_MIN
    bench_mod._STARTED[:] = [("s1", 40.0, t - 70), ("s2", 40.0, t - 60),
                             ("s3", 40.0, t - 50)]
    assert bench_mod._est_scale() == bench_mod._SCALE_MIN
    # slower than estimate never inflates past the cold estimate
    bench_mod._STARTED[:] = [("s1", 1.0, t - 600), ("s2", 1.0, t - 60)]
    assert bench_mod._est_scale() == 1.0

    # (d): 5 min remaining, cold estimate 8 min -> rejected unscaled,
    # admitted at the observed 0.5 ratio (scaled est 4 + 1 margin <= 5)
    bench_mod._STARTED[:] = [("s1", 4.0, t - 300), ("s2", 4.0, t - 180),
                             ("s3", 4.0, t - 60)]
    bench_mod._DEADLINE[0] = t + 5.2 * 60
    assert bench_mod._budget_ok("fits_warm", 8.0) is True
    assert bench_mod._SKIPPED == []
    # and the admitted section was registered for future scaling
    assert bench_mod._STARTED[-1][0] == "fits_warm"


def test_compiled_flops_memo(bench_mod, tmp_path, monkeypatch):
    """FLOPs memoization (round 5): the AOT lower().compile() in
    _compiled_flops is NOT served by the persistent executable cache —
    a warm rig paid 224 s per infer leg recompiling identical programs
    just for cost analysis. The memo keys on the sha of the JAXPR
    pretty-print (structure+shapes; closed-over weights appear by name,
    not value — the lowered HLO text inlines weight blobs and took >13
    min to stringify for xception). Hit must skip compilation entirely
    and return the identical value; different programs get different
    keys."""
    import jax
    import jax.numpy as jnp

    memo_file = tmp_path / "flops_cache.json"
    monkeypatch.setattr(bench_mod, "_flops_cache_path",
                        lambda: str(memo_file))

    @jax.jit
    def f(x):
        return (x @ x).sum()

    @jax.jit
    def g(x):
        return (x @ x @ x).sum()

    x = jnp.ones((32, 32), jnp.float32)
    v1 = bench_mod._compiled_flops(f, x)
    assert v1 > 0
    memo = json.loads(memo_file.read_text())
    assert len(memo) == 1

    v2 = bench_mod._compiled_flops(f, x)
    assert v2 == v1

    v3 = bench_mod._compiled_flops(g, x)
    assert v3 != v1  # structurally different program, different key
    assert len(json.loads(memo_file.read_text())) == 2


def test_steady_state_compiler_options_plumbing(bench_mod):
    """compiler_options must reach the jit of the scan program — the
    only channel that carries backend flags to the REMOTE TPU compiler
    (client-side XLA_FLAGS is parsed by the local CPU XLA build, which
    fatally rejects TPU-only flags — round-5 finding). On CPU we verify
    a cpu-legal option compiles and times, and an unknown option raises
    instead of being silently dropped."""
    import jax.numpy as jnp

    def chain(x):
        return x, x + 1.0

    ms = bench_mod._steady_state_ms(
        chain, jnp.zeros(()), warmup=1, iters=4,
        compiler_options={"xla_cpu_enable_fast_math": False},
    )
    assert ms >= 0.0

    with pytest.raises(Exception, match="compile option"):
        bench_mod._steady_state_ms(
            chain, jnp.zeros(()), warmup=1, iters=4,
            compiler_options={"xla_not_a_real_flag": True},
        )
