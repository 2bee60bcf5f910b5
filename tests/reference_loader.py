"""Import reference torch modules from /root/reference for golden tests.

The reference files import comet_ml / torchvision / torchaudio as
side-effects; those are absent here, so we stub just enough for the model
definitions (pure torch) to import. Reference code is NEVER vendored — it is
imported read-only to generate golden outputs.
"""
import importlib.machinery
import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec on the stub does not
    # raise "__spec__ is None" in later importers (e.g. transformers
    # probing torchvision availability in the same pytest process)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_models():
    """Returns the reference `models` package, importable subset only."""
    _stub("comet_ml", Experiment=object)
    tv = _stub("torchvision")
    _stub("torchvision.transforms", Compose=lambda x: x)
    tv.transforms = sys.modules["torchvision.transforms"]
    _stub("torchvision.models")
    tv.models = sys.modules["torchvision.models"]
    _stub("torchvision.models.video", r3d_18=None)
    tv.models.video = sys.modules["torchvision.models.video"]
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib
    import models  # noqa: F401  (reference package)
    for sub in ("mm_multi_transformers", "mm_transformers",
                "two_transformers", "intra_modal_transformer_fusion",
                "fc_layer", "temporal_convolutional_model",
                "pytorch_i3d_new", "video_resnet", "I3DWSDDA"):
        importlib.import_module(f"models.{sub}")
    return sys.modules["models"]
