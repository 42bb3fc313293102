"""Test harness configuration.

Mirrors the reference's scoped-parametrization CI-speed system
(docs/test_scope_design.md, tests/conftest.py:9-80): the env var
``VXK_TEST_SCOPE`` in {full, ci, mini} trims parametrize values, so the same
suite runs as a quick smoke test or an exhaustive sweep.

Tests run on the CPU backend with an 8-device virtual mesh (the TPU
analogue of the reference's simulator "mini" scope): Pallas kernels execute
in interpreter mode, sharding tests get a real multi-device Mesh.
"""

import os

# Must run before jax initializes a backend.  Set VXK_TEST_TPU=1 to run the
# suite against the real TPU chip instead of the 8-device virtual CPU mesh.
if os.environ.get("VXK_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

SCOPE = os.environ.get("VXK_TEST_SCOPE", "ci")


def scoped(values, ci=None, mini=None, key=None):
    """Explicit per-scope parametrize values (reference:
    tests/test_scope_profiles.py pattern + docs/test_scope_design.md).

    Scopes: ``full`` keeps ``values``; ``ci`` / ``mini`` use the
    trimmed lists; ``ondemand:<profile>`` swaps in one model family's
    shapes for parametrize sites that declare a ``key`` (unknown keys
    keep their ci values) — e.g. ``VXK_TEST_SCOPE=ondemand:deepseek``
    runs attention tests only at MLA head sizes."""
    if SCOPE.startswith("ondemand:"):
        if key is not None:
            from tests.scope_profiles import profile_values

            vals = profile_values(SCOPE.split(":", 1)[1], key)
            if vals is not None:
                return vals
        return ci if ci is not None else values
    if SCOPE == "mini" and mini is not None:
        return mini
    if SCOPE in ("ci", "mini") and ci is not None:
        return ci
    return values


@pytest.fixture(params=["ref", "pallas"])
def impl(request, monkeypatch):
    """Run a test body under both impl tiers: the pure-jnp reference and the
    Pallas kernel (interpret mode off-TPU — the true "fake backend" role of
    the reference's simulator mini scope, docs/test_scope_design.md)."""
    monkeypatch.setenv(
        "VXK_FORCE_REF" if request.param == "ref" else "VXK_FORCE_PALLAS", "1"
    )
    return request.param


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()[:8])
    return Mesh(devs.reshape(2, 4), ("dp", "tp"))
