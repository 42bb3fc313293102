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


def test_format_gate():
    """Formatting invariants over the package + tests (reference role:
    clang-format / pre-commit hooks, .pre-commit-config.yaml): no tabs,
    no trailing whitespace, newline at EOF, bounded line length (the
    package at 84, tests/benchmarks at 92 for golden tables)."""
    bad = []
    for base, limit in (("vllm_xpu_kernels_tpu", 84), ("tests", 92),
                        ("benchmark", 92)):
        for dirpath, _, files in os.walk(os.path.join(ROOT, base)):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                text = open(path, encoding="utf-8").read()
                rel = os.path.relpath(path, ROOT)
                if text and not text.endswith("\n"):
                    bad.append(f"{rel}: missing newline at EOF")
                for i, line in enumerate(text.splitlines(), 1):
                    if "\t" in line:
                        bad.append(f"{rel}:{i}: tab character")
                    if line != line.rstrip():
                        bad.append(f"{rel}:{i}: trailing whitespace")
                    if len(line) > limit and "http" not in line:
                        bad.append(
                            f"{rel}:{i}: line length {len(line)} > {limit}")
    assert not bad, "\n".join(bad[:40])


def test_no_stray_debug_artifacts():
    """No breakpoint()/pdb imports or leftover print-debugging markers in
    the package (benchmarks/tools legitimately print)."""
    bad = []
    for dirpath, _, files in os.walk(os.path.join(ROOT,
                                                  "vllm_xpu_kernels_tpu")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            text = open(path, encoding="utf-8").read()
            rel = os.path.relpath(path, ROOT)
            for i, line in enumerate(text.splitlines(), 1):
                stripped = line.strip()
                if stripped.startswith("breakpoint()"):
                    bad.append(f"{rel}:{i}: breakpoint()")
                if "import pdb" in stripped or "import ipdb" in stripped:
                    bad.append(f"{rel}:{i}: debugger import")
                if stripped.startswith("print(") and "DBG" in stripped:
                    bad.append(f"{rel}:{i}: debug print")
    assert not bad, "\n".join(bad)


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
