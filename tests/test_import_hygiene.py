"""Importing flowfusion_tpu must not initialize any jax backend.

Round-1 regression: module-level ``jnp.log(2*jnp.pi)`` constants in
``models/flow.py`` / ``models/symplectic.py`` initialized the default
(TPU) backend at import time, which broke the driver's multi-chip dry run
— the CPU repoint ran after the backend was already pinned.  This test
pins the invariant: a fresh interpreter can import the full package (and
``__graft_entry__``) without a single backend coming up.
"""

import subprocess
import sys

_CHECK = r"""
import jax
import flowfusion_tpu
import flowfusion_tpu.models.flow
import flowfusion_tpu.models.symplectic
import flowfusion_tpu.models.score
import flowfusion_tpu.train
import flowfusion_tpu.cli
import __graft_entry__
from jax._src import xla_bridge
assert not xla_bridge._backends, (
    "import initialized jax backend(s): %r" % sorted(xla_bridge._backends)
)
print("import-clean")
"""


def test_import_initializes_no_backend():
    # Fresh interpreter: conftest's env mutations are irrelevant because we
    # never *use* a device — any platform would register in _backends.
    out = subprocess.run(
        [sys.executable, "-c", _CHECK],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "import-clean" in out.stdout
