"""Prompt templates and conversation formatting.

Capability parity with reference utils/aff_dataset.py:29-46 (question/
answer templates) and llava/conversation.py (llava_v1 template with
SeparatorStyle.TWO). The exact strings matter: tokenization must match the
shipped checkpoints for weight-converted parity."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ..core.config import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
)

SHORT_QUESTION_LIST = [
    DEFAULT_IMAGE_TOKEN + "\n" + "Can you show me where I have to interact "
    "with the objects to perform the following task: {class_name}?",
    DEFAULT_IMAGE_TOKEN + "\n" + "Please segment the region to perform the "
    "action '{class_name}' in this image.",
    DEFAULT_IMAGE_TOKEN + "\n" + "How can I perform the action "
    "'{class_name}' in this image? Please respond with segmentation mask.",
    DEFAULT_IMAGE_TOKEN + "\n" + "How can I perform the action "
    "'{class_name}' in this image? Please output segmentation mask.",
]

ANSWER_LIST = [
    "It is [SEG].",
    "Sure, [SEG].",
    "Sure, it is [SEG].",
    "Sure, the segmentation result is [SEG].",
    "[SEG].",
]

# The benchmark-inference prompt (reference inference.py:221-226).
INFERENCE_QUESTION = (
    DEFAULT_IMAGE_TOKEN + "\n" + "Where would you interact with the object "
    "to perform action {class_name}")


@dataclass
class Conversation:
    """Two-role conversation with llava_v1 (SeparatorStyle.TWO) layout:
    system + sep + 'USER: q' + sep + 'ASSISTANT: a' + sep2."""

    system: str
    roles: Tuple[str, str] = ("USER", "ASSISTANT")
    sep: str = " "
    sep2: str = "</s>"
    messages: List[Tuple[str, str]] = field(default_factory=list)

    def append_message(self, role: str, message: str):
        self.messages.append((role, message))

    def get_prompt(self) -> str:
        seps = [self.sep, self.sep2]
        out = self.system + seps[0]
        for i, (role, message) in enumerate(self.messages):
            if message:
                out += role + ": " + message + seps[i % 2]
            else:
                out += role + ":"
        return out

    def copy(self) -> "Conversation":
        return Conversation(system=self.system, roles=self.roles,
                            sep=self.sep, sep2=self.sep2,
                            messages=list(self.messages))


CONV_LLAVA_V1 = Conversation(
    system="A chat between a curious human and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the human's questions.")

CONV_TEMPLATES = {
    "llava_v1": CONV_LLAVA_V1,
}


def wrap_image_tokens(prompt: str, use_mm_start_end: bool = True) -> str:
    """<image> -> <im_start><image><im_end> (reference dataset.py:76-87)."""
    if use_mm_start_end:
        return prompt.replace(
            DEFAULT_IMAGE_TOKEN,
            DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
            + DEFAULT_IM_END_TOKEN)
    return prompt


def build_conversation(question: str, answer: str = None,
                       conv_type: str = "llava_v1") -> str:
    conv = CONV_TEMPLATES[conv_type].copy()
    conv.append_message(conv.roles[0], question)
    conv.append_message(conv.roles[1], answer)
    return conv.get_prompt()
