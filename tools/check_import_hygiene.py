"""Import-hygiene lint gate (reference role: tools/enforce_regex_import.py
+ check_spdx_header.py — small repo-invariant checks run in CI).

Invariants for this engine:

1. No module-scope ``import torch`` / ``import transformers`` anywhere in
   ``vllm_xpu_kernels_tpu``: both are test-time-only golden dependencies.
   The engine must import fast and run on machines without them
   (function-local imports are fine — they only execute when an HF
   checkpoint path is actually used).
2. No module-scope JAX backend initialization (``jax.devices()`` /
   ``jax.local_devices()`` at import time): importing the package must
   not claim the TPU client — only explicit calls may (the remote chip
   admits ONE client; an import-time claim would block every other
   process, including the test suite).

Run: ``python tools/check_import_hygiene.py`` (exit 1 on violation);
also enforced by tests/test_lint.py so plain pytest gates it.
"""

from __future__ import annotations

import ast
import os
import sys

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "vllm_xpu_kernels_tpu")

FORBIDDEN_MODULES = ("torch", "transformers", "safetensors")
FORBIDDEN_CALLS = ("devices", "local_devices")


def check_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        src = f.read()
    tree = ast.parse(src, path)
    bad = []

    def module_scope_nodes(t):
        """Top-level statements plus statements inside top-level ifs/trys
        (still executed at import time)."""
        stack = list(t.body)
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, (ast.If, ast.Try, ast.With)):
                for fld in ("body", "orelse", "finalbody", "handlers"):
                    for ch in getattr(node, fld, []):
                        stack.append(
                            ch if not isinstance(ch, ast.ExceptHandler)
                            else ch)
                        if isinstance(ch, ast.ExceptHandler):
                            stack.extend(ch.body)

    for node in module_scope_nodes(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                root = a.name.split(".")[0]
                if root in FORBIDDEN_MODULES:
                    bad.append(f"{path}:{node.lineno}: module-scope "
                               f"'import {a.name}' (test-only dep)")
        elif isinstance(node, ast.ImportFrom):
            root = (node.module or "").split(".")[0]
            if root in FORBIDDEN_MODULES:
                bad.append(f"{path}:{node.lineno}: module-scope "
                           f"'from {node.module} import ...'")
        else:
            for sub in _walk_import_time(node):
                if (isinstance(sub, ast.Call)
                        and isinstance(sub.func, ast.Attribute)
                        and sub.func.attr in FORBIDDEN_CALLS
                        and isinstance(sub.func.value, ast.Name)
                        and sub.func.value.id == "jax"):
                    bad.append(f"{path}:{sub.lineno}: module-scope "
                               f"jax.{sub.func.attr}() claims the TPU "
                               "client at import time")
    return bad


def _walk_import_time(node):
    """ast.walk that does NOT descend into function/lambda bodies — only
    code that actually executes at import time."""
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            # decorators and default args DO run at import time; the
            # body does not
            stack.extend(n.decorator_list)
            stack.extend(n.args.defaults)
            stack.extend(d for d in n.args.kw_defaults if d)
        elif isinstance(n, ast.Lambda):
            pass
        else:
            stack.extend(ast.iter_child_nodes(n))


def main() -> int:
    violations = []
    for dirpath, _, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py"):
                violations += check_file(os.path.join(dirpath, f))
    for v in violations:
        print(v)
    if violations:
        print(f"{len(violations)} import-hygiene violation(s)")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
