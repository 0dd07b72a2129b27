"""Test configuration: force an 8-device virtual CPU mesh.

The TPU-native analog of "testing multi-node without a cluster"
(SURVEY.md §4): all tests run on CPU with 8 virtual XLA devices so
sharding/collective code paths compile and execute without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""
import os
import sys

# XLA's CPU compiler segfaults SPORADICALLY late in long test sessions
# on this box (reproduced 6x: always inside backend_compile_and_load,
# after a few hundred in-process compilations; independent of which
# tests run, of the axon plugin, and of the stack limit — every crashed
# test passes in a fresh process). Deterministic mitigation: when pytest
# is pointed at a DIRECTORY (the driver's `pytest tests/ -x -q`), run
# each test file in its own short-lived subprocess — far below the
# instability horizon — and retry a crashed file once.


def pytest_cmdline_main(config):
    if os.environ.get("DEVQA_IN_SUBPROC") == "1":
        return None  # we ARE a per-file subprocess: run normally
    import glob
    import subprocess

    dirs = [a for a in config.args if os.path.isdir(a)]
    if not dirs:
        return None  # file/test-level invocation: run normally
    files = sorted(f for d in dirs
                   for f in glob.glob(os.path.join(d, "test_*.py")))
    if not files:
        return None
    env = dict(os.environ)
    env["DEVQA_IN_SUBPROC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    crash_rcs = (134, 139, -6, -11)
    failed = []
    for f in files:
        rc = None
        for attempt in (1, 2):
            rc = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q", "--no-header",
                 "-p", "no:cacheprovider"], env=env).returncode
            if rc == 0 or rc not in crash_rcs or attempt == 2:
                break
            print("[conftest] %s crashed (rc=%s); retrying in a fresh "
                  "process" % (f, rc), flush=True)
        if rc != 0:
            failed.append((f, rc))
            if config.getoption("exitfirst", False) or \
                    config.getoption("maxfail", 0) == 1:
                break
    if failed:
        print("[conftest] failed files: %s" % failed, flush=True)
        return 1
    print("[conftest] %d test files passed (isolated processes)"
          % len(files), flush=True)
    return 0

# XLA's CPU backend sporadically segfaults late in long test sessions
# (observed in backend_compile_and_load on the main thread with the
# default 8MB stack); deep LLVM codegen recursion is the usual culprit.
# The hard limit here is unlimited — raise the soft limit so the main
# thread's stack can keep growing.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20
if _soft != resource.RLIM_INFINITY and _soft < _want:
    if _hard == resource.RLIM_INFINITY or _hard >= _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-import jax with a TPU plugin platform pinned via
# JAX_PLATFORMS before conftest runs; jax.config.update overrides it as long
# as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: the persistent compilation cache is deliberately NOT enabled on
# the CPU paths: XLA's CPU AOT loader warns about machine-feature
# mismatches on reload ("could lead to SIGILL") on this box. The TPU
# bench uses it (bench.py) where no CPU AOT is involved.
