"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device paths (DP sharding, SyncBN, psum) are exercised without TPU
hardware via XLA host-platform device emulation — the JAX-idiomatic analog of
a fake backend (SURVEY.md §4).

NOTE: pytest plugins (jaxtyping) import jax before this conftest runs, so
setting os.environ alone is too late for JAX_PLATFORMS — the ambient
environment points at the remote TPU tunnel. We force the platform through
jax.config, which takes effect as long as no backend has been initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat test runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}"
)


def _ensure_native_loader_built():
    """Build native/libyolodata.so once per checkout so the C++ loader tests
    (and the loader's batch fast path) run in a stock `pytest -q` instead of
    silently skipping. Best-effort: a missing toolchain/libjpeg leaves the
    .so absent and the 5 native tests skip exactly as before."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libyolodata.so")
    script = os.path.join(root, "native", "build.sh")
    if os.path.exists(so) or not os.path.exists(script) or not shutil.which("g++"):
        return
    try:
        subprocess.run(
            ["sh", script], capture_output=True, timeout=120, check=True
        )
    except (subprocess.SubprocessError, OSError):
        pass


_ensure_native_loader_built()
