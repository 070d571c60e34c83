"""Driver entry points: dryrun_multichip on the 8-device virtual mesh and
entry()'s example-args consistency (the single-chip compile check itself is
the driver's job — compiling ViT-B/16 on CPU here would be slow)."""

import pytest

pytestmark = pytest.mark.slow  # measured multi-minute module (round-4 durations)


def test_dryrun_multichip_8():
    """The full registered zoo + the int8_ste_static build on the 4x2 mesh
    (the driver's exact invocation)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    """A 2x2 mesh sanity pass on a zoo subset (the full sweep runs above —
    this pins only the alternate mesh factorization)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(4, trainers={"MuDPT", "CoCoOp", "VPT"})


def test_dryrun_multichip_driver_env():
    """Run ``python __graft_entry__.py 8`` as a SUBPROCESS with the driver's
    environment: sitecustomize's TPU plugin registration active, no
    JAX_PLATFORMS=cpu, no conftest — the exact invocation that crashed in
    round 1 (MULTICHIP_r01.json: eager ops dispatched to the tunneled TPU).
    The entry point must force the CPU platform itself."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # the driver provides the virtual device count but NOT a cpu platform
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"), "8"],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout
