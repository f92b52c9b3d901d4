"""Test configuration: run all tests on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without real TPUs (SURVEY.md §4 tier 4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the env pre-sets 'axon' (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize forces the TPU platform regardless of JAX_PLATFORMS;
# override post-import so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch f32; JAX's DEFAULT matmul precision is
# bf16-like on both the oneDNN CPU backend and TPU, so pin full precision here.
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def import_reference_model():
    """Import the reference's src.model for golden-parity tests (running the
    public reference code in tests; nothing is copied into this repo).

    torchvision is not installed in this image; the reference's src package
    imports it transitively (src/__init__.py -> src/dataset.py), so a minimal
    stub is injected — src/model.py itself never uses it."""
    import types

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
        tv.__version__ = "0.0.0-stub"
        tr = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "Resize", "ToTensor", "Normalize",
                     "ColorJitter", "RandomHorizontalFlip"):
            setattr(tr, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
        tr.functional = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = tr.functional
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("src.model")
