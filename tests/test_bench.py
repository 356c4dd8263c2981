"""bench.py driver-contract tests (VERDICT.md round 1, item 1).

The scored artifact must NEVER be a crash: whatever the tunnel does, main()
prints exactly one JSON line with the contract fields and exits 0.  Device
subprocesses are stubbed here — hardware behavior is exercised on the TPU
separately (docs/RESULTS.md).
"""

import json

import bench


class _Result:
    def __init__(self, rc, stdout=""):
        self.returncode = rc
        self.stdout = stdout


def test_resilient_orchestration_recovers(monkeypatch):
    """health fails once (wedged tunnel), then health+worker succeed."""
    calls = []

    def fake_run(flag, timeout):
        calls.append(flag)
        if flag == "--health":
            return _Result(1) if calls.count("--health") == 1 else _Result(0)
        return _Result(0, stdout='{"value": 123456789.0}\n')

    monkeypatch.setattr(bench, "_run_sub", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    value, error = bench._device_value_resilient()
    assert value == 123456789.0 and error is None
    assert calls == ["--health", "--health", "--device-worker"]


def test_resilient_orchestration_rehealths_after_worker_failure(monkeypatch):
    seq = iter(
        [_Result(0), None, _Result(0), _Result(0, '{"value": 5e7}\n')]
    )
    monkeypatch.setattr(bench, "_run_sub", lambda f, t: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    value, error = bench._device_value_resilient()
    assert value == 5e7 and error is None


def test_main_prints_error_json_on_total_failure(monkeypatch, capsys):
    """Unrecoverable tunnel: still rc=0 with a parseable JSON line."""
    monkeypatch.setattr(bench, "_run_sub", lambda f, t: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # shrink the device budget so the retry loop exits immediately (with
    # sleep stubbed out the full 55-min budget would busy-spin)
    monkeypatch.setattr(bench, "DEVICE_BUDGET_S", 1)
    monkeypatch.setattr(bench, "bench_oracle", lambda: 10_000.0)
    rc = bench.main()
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "env_steps_per_s_per_chip"
    assert parsed["value"] == 0
    assert "error" in parsed


def test_worker_json_is_last_line_parseable(monkeypatch):
    """Stray stdout noise before the JSON line must not break parsing."""
    out = "some warning\nnot json\n" + json.dumps({"value": 2e7}) + "\n"
    seq = iter([_Result(0), _Result(0, out)])
    monkeypatch.setattr(bench, "_run_sub", lambda f, t: next(seq))
    value, error = bench._device_value_resilient()
    assert value == 2e7 and error is None


def test_main_fails_fast_on_bad_preset(monkeypatch, capsys):
    """A knob typo must not be retried against the 55-min device budget."""
    monkeypatch.setattr(bench, "PRESET", "tentn")  # typo
    monkeypatch.setattr(
        bench, "_device_value_resilient",
        lambda: (_ for _ in ()).throw(AssertionError("device loop entered")),
    )
    rc = bench.main()
    assert rc == 0
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 0 and "BP_BENCH_PRESET" in parsed["error"]


def test_worker_json_non_dict_lines_skipped(monkeypatch):
    """A JSON-parseable non-dict stdout line (e.g. a bare `0`) must be
    skipped, not crash the parse with TypeError."""
    out = "0\n[1]\nnull\n" + json.dumps({"value": 3e7}) + "\nnull\n"
    seq = iter([_Result(0), _Result(0, out)])
    monkeypatch.setattr(bench, "_run_sub", lambda f, t: next(seq))
    value, error = bench._device_value_resilient()
    assert value == 3e7 and error is None


def test_main_fails_fast_on_bad_num_envs(monkeypatch, capsys):
    """Malformed BP_BENCH_NUM_ENVS emits the contract JSON line, not an
    import/parse traceback."""
    for bad in ("49k", "0", "-5"):
        monkeypatch.setattr(bench, "NUM_ENVS_RAW", bad)
        monkeypatch.setattr(
            bench, "_device_value_resilient",
            lambda: (_ for _ in ()).throw(AssertionError("device loop entered")),
        )
        rc = bench.main()
        assert rc == 0
        parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert parsed["value"] == 0 and "BP_BENCH_NUM_ENVS" in parsed["error"]


def test_main_fails_fast_on_bad_backend(monkeypatch, capsys):
    monkeypatch.setattr(bench, "BACKEND", "cuda")
    monkeypatch.setattr(
        bench, "_device_value_resilient",
        lambda: (_ for _ in ()).throw(AssertionError("device loop entered")),
    )
    rc = bench.main()
    assert rc == 0
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 0 and "BP_BENCH_BACKEND" in parsed["error"]


def test_main_fails_fast_on_contradictory_combo(monkeypatch, capsys):
    """packed + non-bitboard mask (or non-jnp backend) would raise a
    deterministic ValueError inside the worker — reject before the loop."""
    for knob, bad in (("MASK_IMPL", "shift"), ("BACKEND", "hybrid")):
        monkeypatch.setattr(bench, "STATE_IMPL", "packed")
        monkeypatch.setattr(bench, knob, bad)
        monkeypatch.setattr(
            bench, "_device_value_resilient",
            lambda: (_ for _ in ()).throw(AssertionError("device loop entered")),
        )
        rc = bench.main()
        assert rc == 0
        parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert parsed["value"] == 0
        assert "BP_BENCH_STATE_IMPL=packed" in parsed["error"]
        monkeypatch.undo()


def test_main_fails_fast_on_words_sampler_without_packed(monkeypatch, capsys):
    """BP_BENCH_SAMPLER=words needs the packed engine: u8 state, non-jnp
    backend, or non-bitboard mask must be rejected before the device
    loop (round-5 knob)."""
    for knob, bad in (("STATE_IMPL", "u8"), ("BACKEND", "pallas"),
                      ("MASK_IMPL", "shift")):
        monkeypatch.setattr(bench, "SAMPLER", "words")
        monkeypatch.setattr(bench, knob, bad)
        monkeypatch.setattr(
            bench, "_device_value_resilient",
            lambda: (_ for _ in ()).throw(AssertionError("device loop entered")),
        )
        rc = bench.main()
        assert rc == 0
        parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert parsed["value"] == 0
        assert "BP_BENCH_SAMPLER=words" in parsed["error"]
        monkeypatch.undo()


def test_main_fails_fast_on_bad_sampler(monkeypatch, capsys):
    monkeypatch.setattr(bench, "SAMPLER", "gumbel")
    monkeypatch.setattr(
        bench, "_device_value_resilient",
        lambda: (_ for _ in ()).throw(AssertionError("device loop entered")),
    )
    rc = bench.main()
    assert rc == 0
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 0 and "BP_BENCH_SAMPLER" in parsed["error"]


def test_bench_device_words_sampler_runs(monkeypatch):
    """The words-sampler device loop runs end-to-end (tiny shapes, CPU
    sim) and reports a positive steady-state rate — pins the round-5
    BP_BENCH_SAMPLER=words wiring (carry init, step, re-mask)."""
    monkeypatch.setattr(bench, "SAMPLER", "words")
    monkeypatch.setattr(bench, "NUM_ENVS_RAW", "32")
    monkeypatch.setattr(bench, "CHUNK", 8)
    monkeypatch.setattr(bench, "ITERS", 2)
    monkeypatch.setattr(bench, "WINDOWS", 1)
    assert bench.bench_device() > 0


def test_bench_device_default_sampler_runs(monkeypatch):
    """The PRODUCTION bench path (argmax sampler, packed engine) runs
    end-to-end on tiny shapes — insurance that knob refactors never
    break the driver's end-of-round bench."""
    monkeypatch.setattr(bench, "NUM_ENVS_RAW", "32")
    monkeypatch.setattr(bench, "CHUNK", 8)
    monkeypatch.setattr(bench, "ITERS", 2)
    monkeypatch.setattr(bench, "WINDOWS", 1)
    assert bench.bench_device() > 0
