"""Unit tests for the on-device A/B harness's host-side logic
(tools/ab_check.py) — no chip required."""

import importlib.util
import pathlib


def _load_ab_check():
    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools"
        / "ab_check.py"
    )
    spec = importlib.util.spec_from_file_location("ab_check_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_retry_policy_transient_vs_deterministic(monkeypatch):
    """Transient tunnel drops AND timeouts retry (up to 3 attempts —
    both resume from the persistent compile cache, so a cold-cache big
    arm converges across attempts); deterministic failures (VMEM OOM,
    kernel crash) report after ONE attempt — retrying them would burn
    hours of chip time for nothing (round-4 review findings)."""
    ab = _load_ab_check()
    calls = {"n": 0}

    def arm_factory(errors):
        seq = iter(errors)

        def fake_run_arm(cfg, disable_pallas, out_path):
            calls["n"] += 1
            err = next(seq)
            if err is None:
                return True, "", 1.0
            return False, err, 1.0

        return fake_run_arm

    transient = "http: read body: response body closed before all bytes were read"
    oom = "Ran out of memory in memory space vmem while allocating"
    timeout = "runner timed out after 1800s"

    # transient then success -> 2 attempts, ok
    calls["n"] = 0
    monkeypatch.setattr(ab, "run_arm", arm_factory([transient, None]))
    ok, err, _ = ab.run_arm_retry(None, False, "x")
    assert ok and calls["n"] == 2

    # persistent transient -> all 3 attempts, then fail
    calls["n"] = 0
    monkeypatch.setattr(ab, "run_arm", arm_factory([transient] * 3))
    ok, err, _ = ab.run_arm_retry(None, False, "x")
    assert not ok and calls["n"] == 3 and "response body closed" in err

    # deterministic OOM -> exactly 1 attempt
    calls["n"] = 0
    monkeypatch.setattr(ab, "run_arm", arm_factory([oom]))
    ok, err, _ = ab.run_arm_retry(None, False, "x")
    assert not ok and calls["n"] == 1 and "vmem" in err

    # timeout -> resumable (compile cache): retried, succeeds on attempt 2
    calls["n"] = 0
    monkeypatch.setattr(ab, "run_arm", arm_factory([timeout, None]))
    ok, err, _ = ab.run_arm_retry(None, False, "x")
    assert ok and calls["n"] == 2


def test_config_matrix_shape():
    """The matrix spans the documented envelope: small and wide chains,
    N = 2^10..2^16, digit sizes 1/2/4, with the factored-twiddle octaves
    (small 2^16, wide 2^15) present."""
    ab = _load_ab_check()
    names = [c[0] for c in ab.CONFIGS]
    assert "small-2^16-29b-ds1" in names
    assert "wide-2^15-61b-ds1" in names
    degrees = {c[1] for c in ab.CONFIGS}
    assert min(degrees) == 1 << 10 and max(degrees) == 1 << 16
    assert {c[4] for c in ab.CONFIGS} == {1, 2, 4}
    assert ab.QUICK <= set(names)
