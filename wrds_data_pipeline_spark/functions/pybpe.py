"""Pure-Python tokenizer.json interpreter — the dependency-free
fallback for ``functions/tokenize.py``.

Implements the public HuggingFace ``tokenizer.json`` format (the
serialization every HF tokenizer ships) for the subset a counting
pipeline needs: Lowercase normalizer, Whitespace pre-tokenizer,
WordLevel or BPE (merge-list) model, TemplateProcessing
post-processor.  The BPE merge loop is the textbook public algorithm
(Sennrich et al. 2016, as implemented by HF tokenizers): split the
word into symbols, repeatedly merge the adjacent pair with the
lowest merge rank until no ranked pair remains, then map symbols to
ids (unknown symbols → ``unk_token``).

This exists so "tokenizer-grade token counts" is a TESTED claim in
environments without the optional Rust ``tokenizers`` package: the
golden-parity suite drives the same ``tokenizer_token_counts``
mapInPandas path through this interpreter, asserting the identical
hand-derived counts the Rust path must produce.  It is deliberately
NOT a performance path — production counting uses the Rust library
(``hf_tokenizer_factory``); this interpreter is O(word²) per word on
pathological inputs and proud of its simplicity.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass


@dataclass
class _Encoding:
    ids: list[int]


_WHITESPACE_PRE = re.compile(r"\w+|[^\w\s]+")


class PurePythonTokenizer:
    """Interprets a tokenizer.json; exposes the two methods the
    ``tokenizer_token_counts`` factory contract reads
    (``encode_batch`` / ``encode``), returning objects with ``.ids``."""

    def __init__(self, spec: dict):
        self.spec = spec
        norm = spec.get("normalizer") or {}
        if norm and norm.get("type") not in ("Lowercase",):
            raise NotImplementedError(f"normalizer {norm.get('type')!r}")
        self.lowercase = norm.get("type") == "Lowercase"
        pre = spec.get("pre_tokenizer") or {}
        if pre.get("type") not in ("Whitespace",):
            # an ABSENT pre_tokenizer is not "default to whitespace":
            # it means sentencepiece-style whole-text tokenization,
            # which this interpreter does not implement — silently
            # whitespace-splitting would produce wrong counts, the
            # exact failure these guards exist to make loud
            raise NotImplementedError(
                f"pre_tokenizer {pre.get('type')!r} (must be Whitespace)"
            )
        model = spec["model"]
        self.model_type = model["type"]
        if self.model_type not in ("WordLevel", "BPE"):
            raise NotImplementedError(f"model {self.model_type!r}")
        self.vocab: dict[str, int] = model["vocab"]
        self.unk = model.get("unk_token")
        if self.model_type == "BPE":
            # BPE options that change the merge/symbol semantics: a
            # spec that sets any of them would load fine but produce
            # ids/counts DIFFERENT from the Rust backend — guard loud,
            # like every other unsupported feature
            for opt in ("continuing_subword_prefix", "end_of_word_suffix"):
                if model.get(opt):
                    raise NotImplementedError(f"BPE {opt} {model[opt]!r}")
            if model.get("dropout"):
                raise NotImplementedError("BPE dropout")
            if model.get("byte_fallback"):
                raise NotImplementedError("BPE byte_fallback")
            merges = model.get("merges", [])
            # both serializations are public: ["a b", ...] strings or
            # [["a","b"], ...] pairs
            self.ranks = {
                (m[0], m[1])
                if isinstance(m, (list, tuple))
                else tuple(m.split(" ", 1)): r
                for r, m in enumerate(merges)
            }
        post = spec.get("post_processor") or {}
        # specials keep their POSITION relative to the $A sequence item
        # ([CLS] $A [SEP] -> head=[cls], tail=[sep]; $A </s> ->
        # head=[], tail=[eos] — an EOS-only template must append, not
        # prepend)
        self.head_ids: list[int] = []
        self.tail_ids: list[int] = []
        if post:
            if post.get("type") != "TemplateProcessing":
                raise NotImplementedError(
                    f"post_processor {post.get('type')!r}"
                )
            specials = post.get("special_tokens", {})
            seen_sequence = False
            for item in post.get("single", []):
                if "Sequence" in item:
                    seen_sequence = True
                elif "SpecialToken" in item:
                    tok = item["SpecialToken"]["id"]
                    sid = specials[tok]["ids"][0]
                    (self.tail_ids if seen_sequence else self.head_ids).append(sid)

    @classmethod
    def from_file(cls, path: str) -> "PurePythonTokenizer":
        with open(path) as fh:
            return cls(json.load(fh))

    def _bpe_word(self, word: str) -> list[str]:
        symbols = list(word)
        while len(symbols) > 1:
            pairs = [
                (self.ranks[p], i)
                for i, p in enumerate(zip(symbols, symbols[1:]))
                if p in self.ranks
            ]
            if not pairs:
                break
            rank, _ = min(pairs)
            # merge every (left-to-right, non-overlapping) occurrence
            # of the best-ranked pair — the HF merge step
            best = next(p for p in self.ranks if self.ranks[p] == rank)
            out, i = [], 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and (symbols[i], symbols[i + 1]) == best
                ):
                    out.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        return symbols

    def _word_ids(self, word: str) -> list[int]:
        if self.model_type == "WordLevel":
            pieces = [word]
        else:
            pieces = self._bpe_word(word)
        ids = []
        for p in pieces:
            if p in self.vocab:
                ids.append(self.vocab[p])
            elif self.unk is not None:
                ids.append(self.vocab[self.unk])
        return ids

    def encode(self, text: str) -> _Encoding:
        if self.lowercase:
            text = text.lower()
        ids: list[int] = []
        for word in _WHITESPACE_PRE.findall(text):
            ids.extend(self._word_ids(word))
        # TemplateProcessing wraps every encoding; tokenize.py
        # short-circuits empty text before reaching the tokenizer, so
        # matching HF exactly here (specials added even when empty)
        # keeps the two backends interchangeable
        return _Encoding(self.head_ids + ids + self.tail_ids)

    def encode_batch(self, texts: list[str]) -> list[_Encoding]:
        return [self.encode(t) for t in texts]


def local_tokenizer_factory(tokenizer_json_path: str):
    """Factory preferring the Rust ``tokenizers`` library and falling
    back to the pure-Python interpreter when it is absent — the same
    ``tokenizer_token_counts`` contract either way, so pipelines (and
    the golden-parity tests) run identically in both environments."""

    def factory():
        try:
            from tokenizers import Tokenizer

            return Tokenizer.from_file(tokenizer_json_path)
        except ImportError:
            return PurePythonTokenizer.from_file(tokenizer_json_path)

    return factory
