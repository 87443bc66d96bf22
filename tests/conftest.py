import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding is validated
# without TPU hardware (the driver separately dry-runs the multichip path).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("FIREFOAM_TPU_DTYPE", "float64")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

def reference_case(name):
    import os
    p = os.path.join(REFERENCE, "cases", name)
    if not os.path.isdir(p):
        import pytest
        pytest.skip(f"reference case {name} not available")
    return p
