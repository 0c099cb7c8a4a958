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


def load_reference_visual_search():
    """Import /root/reference/visual_search.py (the search policy) as an
    isolated module. spaCy and cv2 are not installed; both are stubbed —
    spaCy's chunker is only reached through `extract_noun_chunks`, which
    search-path parity tests override on the module, and cv2 only feeds
    the visualization helpers, never the search itself."""
    name = "ref_visual_search"
    if name in sys.modules:
        return sys.modules[name]
    load_reference()  # sys.path + package shims

    import importlib.machinery
    import importlib.util
    for stub_name, attrs in (("spacy", {"load": lambda *a, **k: None}),
                             ("cv2", {})):
        if stub_name not in sys.modules:
            m = types.ModuleType(stub_name)
            m.__spec__ = importlib.machinery.ModuleSpec(stub_name, None)
            for k, v in attrs.items():
                setattr(m, k, v)
            m.__getattr__ = lambda _n: None
            sys.modules[stub_name] = m

    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/visual_search.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
