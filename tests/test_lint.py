"""Repo-invariant lint gates run as tests (reference role:
tools/enforce_regex_import.py + check_spdx_header.py via pre-commit;
here plain pytest is the CI hook)."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_import_hygiene():
    """No module-scope torch/transformers imports or TPU-client claims in
    the package (see tools/check_import_hygiene.py)."""
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools",
                                      "check_import_hygiene.py")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_package_imports_without_torch():
    """The engine imports in a clean interpreter with torch/transformers
    masked out — proving the gated imports above are real."""
    code = (
        "import sys\n"
        "sys.modules['torch'] = None\n"
        "sys.modules['transformers'] = None\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import vllm_xpu_kernels_tpu as vxk\n"
        "import vllm_xpu_kernels_tpu.models\n"
        "print('ok')\n"
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "ok" in r.stdout, r.stdout + r.stderr
