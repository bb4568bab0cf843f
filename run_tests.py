#!/usr/bin/env python
"""Test runner (reference run_tests.py parity): executes the pytest suite
on the virtual 8-device CPU mesh and reports failures."""

import os
import subprocess
import sys

env = dict(os.environ)
env.setdefault("JAX_PLATFORMS", "cpu")
flags = env.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

rc = subprocess.call([sys.executable, "-m", "pytest", "tests/", "-q", *sys.argv[1:]], env=env)
sys.exit(rc)
