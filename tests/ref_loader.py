"""Load the reference torch models from /root/reference (read-only fixture).

The reference packages (`LLaVA.llava`, `VisualSearch.model`) are imported
in-place so composed-model parity tests can drive the ACTUAL reference
splice/generate/inference code paths (SURVEY.md §4: "the PyTorch reference
itself is the fixture"). Two environment shims are needed:

- `einops_exts` is not installed; its two helpers used by the reference
  perceiver (perceiver.py:11) are one-line multi-tensor wrappers.
- Modern transformers already registers a "llava" AutoConfig; the
  reference modules call `AutoConfig.register("llava", ...)` at import
  time (llava_llama.py:139). Tests construct the reference classes
  directly, so registration is irrelevant — it is no-opped during import.
"""

import sys
import types


def load_reference():
    """Import and return the reference model modules (cached)."""
    if "LLaVA.llava.model" in sys.modules:
        import LLaVA.llava.model as lm
        import VisualSearch.model.VSM as vsm_mod
        return lm, vsm_mod

    import einops
    ee = types.ModuleType("einops_exts")
    ee.rearrange_many = lambda xs, *a, **k: tuple(
        einops.rearrange(x, *a, **k) for x in xs)
    ee.repeat_many = lambda xs, *a, **k: tuple(
        einops.repeat(x, *a, **k) for x in xs)
    sys.modules.setdefault("einops_exts", ee)

    # torchvision is not installed; only the vestigial SamAutomaticMaskGenerator
    # (imported by segment_anything/__init__.py) and DETR misc helpers touch
    # it, never on the paths under test.
    if "torchvision" not in sys.modules:
        import importlib.machinery
        mods = {}
        for name in ("torchvision", "torchvision.ops",
                     "torchvision.ops.boxes", "torchvision.transforms",
                     "torchvision.transforms.functional"):
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            m.__path__ = []  # mark as package so submodule imports resolve
            mods[name] = m
        for leaf in ("torchvision.ops.boxes",
                     "torchvision.transforms.functional"):
            mods[leaf].__getattr__ = lambda name: None  # PEP 562: any name
        mods["torchvision"].ops = mods["torchvision.ops"]
        mods["torchvision"].transforms = mods["torchvision.transforms"]
        mods["torchvision.ops"].boxes = mods["torchvision.ops.boxes"]
        mods["torchvision.transforms"].functional = (
            mods["torchvision.transforms.functional"])
        mods["torchvision"].__version__ = "0.0-stub"
        sys.modules.update(mods)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    # The vestigial MPT stacks (SURVEY.md §1) no longer import on modern
    # transformers (bloom._expand_mask was removed); the package __init__s
    # import them unconditionally, so stub them out.
    for name in ("LLaVA.llava.model.language_model.llava_mpt",
                 "VisualSearch.model.llava.model.language_model.llava_mpt"):
        stub = types.ModuleType(name)
        stub.LlavaMPTForCausalLM = type("LlavaMPTForCausalLM", (), {})
        stub.LlavaMPTConfig = type("LlavaMPTConfig", (), {})
        sys.modules.setdefault(name, stub)

    from transformers import AutoConfig, AutoModelForCausalLM
    orig_cfg, orig_lm = AutoConfig.register, AutoModelForCausalLM.register
    AutoConfig.register = staticmethod(lambda *a, **k: None)
    AutoModelForCausalLM.register = classmethod(lambda cls, *a, **k: None)
    try:
        import LLaVA.llava.model as lm
        import VisualSearch.model.VSM as vsm_mod
    finally:
        AutoConfig.register = orig_cfg
        AutoModelForCausalLM.register = orig_lm
    return lm, vsm_mod
