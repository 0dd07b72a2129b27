"""Conversation templates for chat serving.

Functional rebuild of the reference's template objects —
``editor/vllms_for_edit/minigpt4/modules/conversation.py:109-116``
(CONV_VISION_Vicuna0) and
``easyeditor/trainer/mPLUG_Owl2/mplug_owl2/conversation.py:234-296``
(conv_vicuna_v0/v1, conv_mplug_owl2). The editing harness does NOT use
templates (MiniGPT4ForEdit splices raw text, minigpt4.py:33-45); they
serve the chat CLI / worker, exactly like the reference's serve stack.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple


@dataclasses.dataclass(frozen=True)
class Conversation:
    system: str
    roles: Tuple[str, str]
    sep_style: str = "single"   # "single" | "two"
    sep: str = "###"
    sep2: str = "</s>"
    role_suffix: str = ": "     # between role tag and content

    def get_prompt(self, messages: List[Tuple[str, str]]) -> str:
        """messages: [(role, text|None)] — None marks the slot the model
        completes (conversation.py:36-69 get_prompt)."""
        if self.sep_style == "single":
            out = self.system + self.sep if self.system else ""
            for role, text in messages:
                if text is not None:
                    out += role + self.role_suffix + text + self.sep
                else:
                    out += role + self.role_suffix.rstrip()
            return out
        # "two": alternating sep/sep2 after each turn (vicuna v1 / owl2)
        seps = (self.sep, self.sep2)
        out = self.system + seps[0] if self.system else ""
        for i, (role, text) in enumerate(messages):
            if text is not None:
                out += role + self.role_suffix + text + seps[i % 2]
            else:
                out += role + self.role_suffix.rstrip()
        return out

    def wrap(self, user_text: str) -> str:
        """One-shot prompt: system + user turn + empty assistant slot."""
        return self.get_prompt([(self.roles[0], user_text),
                                (self.roles[1], None)])


CONV_VISION_VICUNA0 = Conversation(
    system=("Give the following image: <Img>ImageContent</Img>. "
            "You will be able to see the image once I provide it to you. "
            "Please answer my questions."),
    roles=("Human", "Assistant"),
    sep_style="single", sep="###",
)

CONV_VICUNA_V1 = Conversation(
    system=("A chat between a curious user and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the user's questions."),
    roles=("USER", "ASSISTANT"),
    sep_style="two", sep=" ", sep2="</s>",
)

CONV_MPLUG_OWL2 = Conversation(
    system=("A chat between a curious human and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the human's questions."),
    roles=("USER", "ASSISTANT"),
    sep_style="two", sep=" ", sep2="</s>",
)

CONV_TEMPLATES = {
    "none": None,
    "v0": CONV_VISION_VICUNA0,
    "minigpt4": CONV_VISION_VICUNA0,
    "v1": CONV_VICUNA_V1,
    "vicuna_v1": CONV_VICUNA_V1,
    "mplug_owl2": CONV_MPLUG_OWL2,
    "owl2": CONV_MPLUG_OWL2,
}
