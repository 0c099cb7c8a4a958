"""Shared helpers for the 7B benchmark scripts.

Tok: a deterministic zlib-hash word tokenizer so full-scale models run
without real checkpoint vocab files; ids are stable across scripts so
throughput numbers stay comparable.
"""
import zlib


class Tok:
    bos_token_id = 1
    eos_token_id = 2

    class _O:
        def __init__(s, i):
            s.input_ids = i

    def __call__(self, text, add_special_tokens=True):
        text = text.replace("</s>", " </s> ").replace("[LOC]", " [LOC] ")
        ids = [1] if add_special_tokens else []
        for w in text.split():
            ids.append(2 if w == "</s>" else 3 if w == "[LOC]"
                       else 4 + zlib.crc32(w.encode()) % 31000)
        return self._O(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids if i > 3)
