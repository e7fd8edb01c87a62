"""Smoke the checked-in examples as subprocesses — demos rot silently
otherwise.  quickstart trains for minutes, so only the multichip demo (the
multi-chip API surface in one file) runs in CI."""

import os
import subprocess
import sys


def test_multichip_example_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "multichip.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
    assert "multichip demo OK" in r.stdout
    assert "token-identical" in r.stdout


def test_serve_http_example_runs():
    """The HTTP front end: concurrent clients over the engine's online
    submit/step API, each response checked against specgenerate."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "serve_http.py"),
         "--selftest", "--port", "8431", "--batch", "2"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
    assert "serve_http demo OK" in r.stdout
    assert "6/6 concurrent HTTP requests match" in r.stdout


def test_serve_http_per_request_sampling_runs():
    """The HTTP front end with per-request sampling: mixed greedy + sampled
    clients in one engine (top_k=1 keeps the sampled responses deterministic
    so the selftest's specgenerate comparison still applies)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "serve_http.py"),
         "--selftest", "--port", "8437", "--batch", "2",
         "--per-request-sampling"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
    assert "serve_http demo OK" in r.stdout
    assert "6/6 concurrent HTTP requests match" in r.stdout


def test_serving_example_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": repo + ":" + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "serving.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
    assert "served 12 requests" in r.stdout
