"""Import-and-helper smoke for the driver-facing surfaces.

bench.py and __graft_entry__.py are executed by the round driver on the
real TPU; a trivial import error or helper regression there turns into a
red round artifact. These tests pin everything that can be checked
without the device.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_module_imports_and_oracle_runs():
    bench = _load("bench")
    rng = np.random.default_rng(0)
    ids = np.repeat(np.arange(9), 4)
    X_a = rng.normal(size=(36, 12, 6))
    X_b = rng.normal(size=(36, 12, 6))
    M = bench._numpy_oracle_fit(X_a, X_b, ids, ids)
    assert M.shape == (6, 6) and np.isfinite(M).all()


def test_bench_flops_formula_positive_and_scales():
    bench = _load("bench")
    f1 = bench._seq2seq_flops_per_step(1000, 200, 30, 100, 500, 10, 3, 9)
    f2 = bench._seq2seq_flops_per_step(2000, 200, 30, 100, 500, 10, 3, 9)
    assert f1 > 0 and abs(f2 / f1 - 2.0) < 1e-6  # linear in batch
    # order of magnitude: ~2 TFLOP per train step at reference scale
    assert 5e11 < f1 < 5e12


def test_bench_compile_retry_retries_then_raises():
    bench = _load("bench")
    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 2:
            raise RuntimeError("HTTP 500")
        return "ok"

    assert bench._with_compile_retry(flaky, 1, attempts=3, delay=0.0) == "ok"
    assert len(calls) == 2

    def dead(x):
        raise RuntimeError("always")

    try:
        bench._with_compile_retry(dead, 1, attempts=2, delay=0.0)
        raise AssertionError("should have raised")
    except RuntimeError:
        pass


def test_graft_entry_module_imports():
    g = _load("__graft_entry__")
    assert callable(g.entry) and callable(g.dryrun_multichip)


def test_bench_ctc_flops_formula():
    bench = _load("bench")
    f1 = bench._ctc_flops_per_step(2000, 600, 60, 512, 3, 11, 14, 4)
    f2 = bench._ctc_flops_per_step(4000, 600, 60, 512, 3, 11, 14, 4)
    assert f1 > 0 and abs(f2 / f1 - 2.0) < 1e-6
    # ~9 model-TFLOP per step at fig_5 production scale (74 TF/s at
    # ~120 ms, docs/ROUND3.md)
    assert 3e12 < f1 < 3e13


def test_bench_aggregate_line_always_parses():
    bench = _load("bench")
    agg = bench.Aggregate()
    # empty: every metric null, still a valid object with the contract keys
    out = __import__("json").loads(agg.line())
    assert out["metric"] == "alignment_fits_per_sec"
    assert out["value"] is None and out["vs_baseline"] is None
    assert out["sections_timed_out"] == []
    # partial: alignment + calib only -> mfu_measured derivable for none
    agg.frag.update({
        "alignment_fits_per_sec": 5000.0,
        "alignment_vs_baseline": 200.0,
        "ceiling_tfps_measured": 100.0,
        "ctc_model_tfps": 74.0,
    })
    agg.timed_out.append("seq2seq")
    out = __import__("json").loads(agg.line())
    assert out["value"] == 5000.0
    assert out["ctc_mfu_measured"] == 0.74
    assert out["seq2seq_mfu_measured"] is None
    assert out["sections_timed_out"] == ["seq2seq"]


def test_bench_realtime_keys_are_dispatch_labeled():
    """Round-5 rename (VERDICT #7): the per-step latency keys must say
    'dispatch' so cross-round consumers don't read tunnel dispatch time
    as device-kernel latency; the amortized key is the compute truth."""
    bench = _load("bench")
    agg = bench.Aggregate()
    agg.frag.update({
        "realtime_amortized_ms_per_bin": 0.07,
        "realtime_p50_dispatch_ms": 1.2,
        "realtime_max_dispatch_ms": 2.4,
    })
    out = __import__("json").loads(agg.line())
    assert out["realtime_p50_dispatch_ms"] == 1.2
    assert out["realtime_max_dispatch_ms"] == 2.4
    assert "realtime_p50_ms" not in out and "realtime_max_ms" not in out


def test_bench_relay_probe_gated_on_axon_host(monkeypatch):
    """Round-4 advisor: on a host without the axon relay (no .axon_site
    PYTHONPATH hook), a refused TCP connect must not condemn the
    backend — the relay probe is skipped entirely."""
    bench = _load("bench")
    monkeypatch.setenv("PYTHONPATH", "/some/ordinary/path")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert not bench._axon_relay_in_play()
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")
    assert bench._axon_relay_in_play()
    monkeypatch.setenv("BENCH_AXON_RELAY", "0")  # explicit opt-out
    assert not bench._axon_relay_in_play()


def test_bench_parse_child_json_takes_last_object():
    bench = _load("bench")
    stdout = "noise\n{\"a\": 1}\nwarn\n{\"b\": 2}\n"
    assert bench._parse_child_json(stdout) == {"b": 2}
    assert bench._parse_child_json("no json here") is None


def _run_bench(env_extra, timeout=120, sig_after=None):
    import json
    import os
    import signal
    import subprocess
    import tempfile
    import time

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    ready = None
    if sig_after is not None:
        # interpreter startup is slow (site hook pre-imports jax) and
        # varies with load; signal only once the handlers are LIVE, or
        # the default SIGTERM disposition kills the process silently
        fd, ready = tempfile.mkstemp(suffix=".bench_ready")
        os.close(fd)
        os.unlink(ready)
        env["BENCH_READY_FILE"] = ready
    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=str(ROOT),
    )
    if sig_after is not None:
        deadline = time.monotonic() + 60
        while not os.path.exists(ready) and time.monotonic() < deadline:
            time.sleep(0.1)
        assert os.path.exists(ready), "bench never signaled readiness"
        os.unlink(ready)
        time.sleep(sig_after)
        proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=timeout)
    line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
    return proc.returncode, json.loads(line)


def test_bench_emits_parseable_json_when_section_times_out():
    """The round-3 failure mode (BENCH_r03 rc=124, parsed=null): a
    section stuck in a cold compile must NOT take the artifact down."""
    rc, out = _run_bench({
        "BENCH_SECTIONS": "sleep",
        "BENCH_TEST_SLEEP_S": "60",
        "BENCH_BUDGET_SLEEP": "3",
        "BENCH_GLOBAL_BUDGET_S": "60",
    })
    assert rc == 0
    assert out["sections_timed_out"] == ["sleep"]
    assert out["value"] is None  # alignment never ran; still parseable


def test_bench_salvages_partial_fragment_from_timed_out_section():
    """A section killed on budget still contributes any INTERMEDIATE
    fragment it printed (round 5: under a degraded tunnel the realtime
    section computes its amortized number, then blows the budget in the
    dispatch-heavy per-step phase)."""
    rc, out = _run_bench({
        "BENCH_SECTIONS": "sleep",
        "BENCH_TEST_SLEEP_S": "60",
        "BENCH_TEST_PARTIAL": "1",
        "BENCH_BUDGET_SLEEP": "5",
        "BENCH_GLOBAL_BUDGET_S": "60",
    }, timeout=180)
    assert rc == 0
    assert out["sections_timed_out"] == ["sleep"]
    # the intermediate fragment survived into the final line
    assert out["realtime_amortized_ms_per_bin"] == 1.5


def test_bench_emits_on_sigterm():
    """The driver's `timeout` SIGTERMs the parent mid-run; the handler
    must still print the line."""
    rc, out = _run_bench(
        {
            "BENCH_SECTIONS": "sleep",
            "BENCH_TEST_SLEEP_S": "60",
            "BENCH_BUDGET_SLEEP": "55",
            "BENCH_GLOBAL_BUDGET_S": "90",
        },
        sig_after=3.0,
    )
    assert rc == 0
    assert out["metric"] == "alignment_fits_per_sec"


def test_bench_calib_section_end_to_end_cpu():
    """Success path: a tiny calib child runs on the CPU backend and its
    fragment lands in the final line."""
    rc, out = _run_bench({
        "BENCH_SECTIONS": "calib",
        "BENCH_CALIB_N": "256",
        "BENCH_GLOBAL_BUDGET_S": "110",
        "BENCH_BUDGET_CALIB": "100",
    })
    assert rc == 0
    assert out["sections_timed_out"] == []
    assert out["sections_failed"] == []
    assert out["ceiling_tfps_measured"] is not None
    assert out["ceiling_tfps_measured"] > 0


def test_bench_bad_argv_errors_instead_of_full_run():
    bench = _load("bench")
    assert bench.main(["--probe"]) == 2
    assert bench.main(["--section"]) == 2
    assert bench.main(["unexpected"]) == 2


def test_bench_failed_section_lands_in_sections_failed():
    rc, out = _run_bench({
        "BENCH_SECTIONS": "doesnotexist",
        "BENCH_GLOBAL_BUDGET_S": "60",
        "BENCH_BUDGET_DOESNOTEXIST": "30",
    })
    assert rc == 0
    assert out["sections_failed"] == ["doesnotexist"]


def test_probes_registry_and_unknown_name():
    sys.path.insert(0, str(ROOT))
    from tools import probes

    assert set(probes.PROBES) == {
        "ctc_stages", "s2s_stages", "foldpar_pallas",
        "ctc_driver_overhead", "bf16_parity", "bwd_accum",
    }
    assert all(callable(f) for f in probes.PROBES.values())
    assert probes.run("no_such_probe", []) == 2
