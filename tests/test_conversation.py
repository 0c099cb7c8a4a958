"""Byte-for-byte template parity vs the reference conversation module.

The reference prompt state machine (LLaVA/llava/conversation.py) is pure
Python with no torch dependency, so it is loaded directly by file path and
used as the oracle: every registry name must render the same prompt for the
same dialog, across all five separator styles.
"""

import importlib.util
import sys

import pytest

from vstar_tpu.multimodal.conversation import CONV_TEMPLATES, SeparatorStyle

REF_PATH = "/root/reference/LLaVA/llava/conversation.py"


def _load_ref():
    if "ref_conversation" in sys.modules:
        return sys.modules["ref_conversation"]
    spec = importlib.util.spec_from_file_location("ref_conversation", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_conversation"] = mod
    return mod


DIALOG = [
    "What is in the <image> shown here?",
    "A small dog on a couch.",
    "Where is the remote most likely to be?",
    "On the armrest next to the dog.",
]


@pytest.mark.parametrize("name", sorted(CONV_TEMPLATES))
def test_registry_prompt_parity(name):
    ref = _load_ref()
    assert name in ref.conv_templates, f"{name} not in reference registry"
    ref_conv = ref.conv_templates[name].copy()
    conv = CONV_TEMPLATES[name]()

    assert tuple(ref_conv.roles) == tuple(conv.roles)
    # The reference PLAIN template ships sep2=None and is only ever rendered
    # with a single user turn (pretrain pairs); a full dialog raises in the
    # reference itself, so the oracle comparison stays on its actual domain.
    dialog = DIALOG[:1] if conv.sep_style == SeparatorStyle.PLAIN else DIALOG
    for i, msg in enumerate(dialog):
        ref_conv.append_message(ref_conv.roles[i % 2], msg)
        conv.append_message(conv.roles[i % 2], msg)
    assert conv.get_prompt() == ref_conv.get_prompt()

    if conv.sep_style != SeparatorStyle.PLAIN:
        # Generation-prompt form: trailing assistant turn left open.
        ref_conv.append_message(ref_conv.roles[0], "And the leash?")
        ref_conv.append_message(ref_conv.roles[1], None)
        conv.append_message(conv.roles[0], "And the leash?")
        conv.append_message(conv.roles[1], None)
        assert conv.get_prompt() == ref_conv.get_prompt()


def test_registry_covers_reference():
    ref = _load_ref()
    missing = set(ref.conv_templates) - set(CONV_TEMPLATES)
    assert not missing, f"reference template names absent: {missing}"


def test_vsm_default_template_is_llava_v1():
    # The reference VSM wrapper defaults to conv_type='llava_v1'
    # (visual_search.py:47-50) whose system line is the 'curious human'
    # variant — distinct from the VQA side's 'v1'.
    conv = CONV_TEMPLATES["llava_v1"]()
    assert conv.system.startswith("A chat between a curious human")
    assert conv.sep_style == SeparatorStyle.TWO


def test_copy_is_deep():
    conv = CONV_TEMPLATES["v1"]()
    conv.append_message(conv.roles[0], "hi")
    dup = conv.copy()
    dup.messages[0][1] = "changed"
    assert conv.messages[0][1] == "hi"
