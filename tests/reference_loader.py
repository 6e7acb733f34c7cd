"""Import the reference implementation (/root/reference) for golden parity
tests.

The reference depends on torchvision/tinydb/cv2 at import time in some
modules; torchvision is not installed here, so a stub module is inserted
(it is never *used* by the code paths the tests exercise). This imports the
reference for *comparison only* — no reference code is copied into sdm_tpu.
"""

import importlib.util
import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def load_reference_module(name: str):
    """Import /root/reference/<name>.py by FILE PATH under an unambiguous
    sys.modules key. By-name imports (importlib.import_module) are fragile
    here: the repo root carries entry-point shims with the same names as
    the reference's scripts, so any code that prepends the repo root to
    sys.path at runtime (the tools/ drivers do) would shadow the reference
    and break the golden-parity tests."""
    _ensure_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)  # for the module's own imports
    key = "_reference_" + name
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(
        key, os.path.join(REFERENCE_PATH, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def _ensure_stubs():
    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.utils = types.SimpleNamespace()
        stub.transforms = types.SimpleNamespace()
        sys.modules["torchvision"] = stub


def load_reference():
    """Returns a namespace with the reference's U_Net, degraders and samplers."""
    _ensure_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from models.U_Net import U_Net  # noqa
    import degraders  # noqa
    import diffusion_sampling_algorithms as samplers  # noqa

    ns = types.SimpleNamespace(
        U_Net=U_Net,
        NoiseDegradation=degraders.NoiseDegradation,
        CosineNoiseDegradation=degraders.CosineNoiseDegradation,
        ddpm_sampling=samplers.ddpm_sampling,
        ddim_sampling=samplers.ddim_sampling,
        cold_diffusion_sampling=samplers.cold_diffusion_sampling,
    )
    return ns
