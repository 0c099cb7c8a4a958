"""Conversation prompt templates.

Only the templates on the live SEAL path are implemented:
  * 'v1' (Vicuna): "system USER: msg ASSISTANT: msg</s>..." with sep=' ',
    sep2='</s>' (reference LLaVA/llava/conversation.py:252-263, style TWO).
  * 'plain': bare concatenation used by projector pretraining.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

VICUNA_SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions.")


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    sep: str
    sep2: str
    messages: List[List[Optional[str]]] = dataclasses.field(
        default_factory=list)

    def copy(self) -> "Conversation":
        return Conversation(self.system, self.roles, self.sep, self.sep2,
                            [list(m) for m in self.messages])

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def get_prompt(self) -> str:
        """Vicuna-style TWO-separator prompt (conversation.py:78-88)."""
        seps = [self.sep, self.sep2]
        ret = self.system + seps[0]
        for i, (role, message) in enumerate(self.messages):
            if message:
                ret += role + ": " + message + seps[i % 2]
            else:
                ret += role + ":"
        return ret


def conv_vicuna_v1() -> Conversation:
    return Conversation(system=VICUNA_SYSTEM, roles=("USER", "ASSISTANT"),
                        sep=" ", sep2="</s>")


def conv_llava_v1() -> Conversation:
    return conv_vicuna_v1()


CONV_TEMPLATES = {
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llava_v1": conv_llava_v1,
}
