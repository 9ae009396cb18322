"""Pure-Python tokenizer.json interpreter — the dependency-free
fallback for ``functions/tokenize.py``.

Implements the public HuggingFace ``tokenizer.json`` format (the
serialization every HF tokenizer ships) for the subset a counting
pipeline needs: Lowercase / Prepend / Replace(String) / BertNormalizer
normalizers (Sequences flattened), Whitespace / ByteLevel
(GPT-2-style) / Metaspace (SentencePiece-style) / BertPreTokenizer
pre-tokenizer — or the Llama-2-family NULL pre-tokenizer, where a
Prepend(▁)+Replace(' '→▁) normalizer feeds the whole text to the
model — WordLevel, BPE (merge-list, with sentencepiece
``byte_fallback``), WordPiece (greedy longest-match-first with ``##``
continuation — the BERT family), or Unigram (Viterbi over piece
log-probs — Kudo 2018: T5/ALBERT/XLNet and most SentencePiece
exports, with ``byte_fallback``) model, TemplateProcessing (or no-op
ByteLevel) post-processor.  Together these cover every mainstream
public family: BERT-style WordPiece, plain WordLevel, GPT-2-style
byte-level BPE, T5-style Unigram, Llama-2-style sentencepiece-BPE.
The BPE
merge loop is the textbook public algorithm (Sennrich et al. 2016,
as implemented by HF tokenizers): split the word into symbols,
repeatedly merge the adjacent pair with the lowest merge rank until
no ranked pair remains, then map symbols to ids (unknown symbols →
``unk_token``).

Byte-level BPE (the most common public format — GPT-2, RoBERTa,
many modern LLM tokenizers) adds two public pieces, both from the
GPT-2 reference implementation: the byte→unicode table (every byte
mapped to a printable codepoint so the BPE alphabet is exactly 256
symbols) and the GPT-2 pre-tokenization regex (contractions,
optional-space+letters/digits/punct runs, whitespace runs that
leave their last space to prefix the next word).  Python's ``re``
lacks ``\\p{L}``, so the regex is transcribed as an explicit scanner
(``_gpt2_words``) over ``unicodedata`` categories — byte-identical
on the pattern's alternation order, including the backtracking
``\\s+(?!\\S)`` branch.  Exotic divergence note: the scanner treats
``str.isspace()`` as ``\\s``, which differs from the Rust regex
class on a few control codepoints (U+001C–001F) no tokenizer
corpus contains.

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

_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def _bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode table (public reference constant):
    printable latin bytes map to themselves, the rest to 256+n — a
    bijection making every byte a visible codepoint so BPE merges
    operate on plain strings."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_UNICODE = _bytes_to_unicode()


def _cat(ch: str) -> str:
    import unicodedata

    return unicodedata.category(ch)[0]


def _gpt2_words(text: str) -> list[str]:
    """Scanner transcription of the GPT-2 pre-tokenization regex
    ``'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|
    \\s+(?!\\S)|\\s+`` — alternation order preserved, including the
    backtracking whitespace branch (a run followed by a non-space
    yields all but its last char, leaving that char to prefix the
    next word via the ``  ?`` branches)."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        for c in _CONTRACTIONS:
            if text.startswith(c, i):
                out.append(c)
                i += len(c)
                break
        else:
            sp = text[i] == " " and i + 1 < n
            k = i + 1 if sp else i
            c2 = text[k] if k < n else ""
            cat = _cat(c2) if c2 else ""
            if cat == "L" or cat == "N":
                j = k + 1
                while j < n and _cat(text[j]) == cat:
                    j += 1
                out.append(text[i:j])
                i = j
            elif c2 and not c2.isspace():
                j = k + 1
                while (
                    j < n
                    and not text[j].isspace()
                    and _cat(text[j]) not in ("L", "N")
                ):
                    j += 1
                out.append(text[i:j])
                i = j
            elif text[i].isspace():
                j = i + 1
                while j < n and text[j].isspace():
                    j += 1
                if j < n and j - i > 1:
                    # \s+(?!\S): leave the last space for the next word
                    out.append(text[i : j - 1])
                    i = j - 1
                else:
                    out.append(text[i:j])
                    i = j
            # no other case exists: a non-space char lands in one of
            # the L/N/punct branches, whitespace in the run branch
    return out


def _bert_is_punct(ch: str) -> bool:
    """BERT's punctuation class (public reference,
    google-research/bert tokenization.py — mirrored by HF's
    BertPreTokenizer): the four ASCII punctuation ranges, plus any
    Unicode P* category."""
    import unicodedata

    cp = ord(ch)
    if (
        33 <= cp <= 47
        or 58 <= cp <= 64
        or 91 <= cp <= 96
        or 123 <= cp <= 126
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _bert_words(text: str) -> list[str]:
    """The BertPreTokenizer: split on whitespace (removed), then
    isolate each punctuation char as its own word — the pre-tokenizer
    every BERT-family tokenizer.json ships."""
    out: list[str] = []
    for w in text.split():
        buf: list[str] = []
        for ch in w:
            if _bert_is_punct(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
    return out


# the CJK ideograph blocks BertNormalizer space-pads (public
# reference constant, google-research/bert tokenization.py)
_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


def _bert_normalize(
    text: str,
    clean_text: bool,
    handle_chinese_chars: bool,
    strip_accents: bool | None,
    lowercase: bool,
) -> str:
    """The BertNormalizer, in the Rust backend's step order:
    clean_text (drop NUL/U+FFFD/control chars, map whitespace to one
    space) → CJK space-padding → strip accents (NFD, drop Mn;
    defaulting to the lowercase flag when unset, the HF rule) →
    lowercase."""
    import unicodedata

    if clean_text:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD:
                continue
            if ch in ("\t", "\n", "\r") or unicodedata.category(ch) == "Zs":
                out.append(" ")
            elif unicodedata.category(ch).startswith("C"):
                continue
            else:
                out.append(ch)
        text = "".join(out)
    if handle_chinese_chars:
        out = []
        for ch in text:
            cp = ord(ch)
            if any(lo <= cp <= hi for lo, hi in _CJK_RANGES):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        text = "".join(out)
    if strip_accents if strip_accents is not None else lowercase:
        text = "".join(
            ch
            for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )
    if lowercase:
        text = text.lower()
    return text


class PurePythonTokenizer:
    """Interprets a tokenizer.json; exposes the two methods the
    ``tokenizer_token_counts`` factory contract reads
    (``encode_batch`` / ``encode``), returning objects with ``.ids``."""

    def __init__(self, spec: dict):
        self.spec = spec
        self._norm_steps = self._parse_normalizer(
            spec.get("normalizer") or {}
        )
        pre = spec.get("pre_tokenizer") or {}
        if not pre and self._sentencepiece_shape:
            # the Llama-2-family serialization: pre_tokenizer null,
            # the space→▁ mapping done by a Prepend/Replace
            # normalizer, the MODEL tokenizing the whole normalized
            # text — supported as the whole-text path (pre_type None)
            self.pre_type = None
        elif pre.get("type") not in (
            "Whitespace", "ByteLevel", "Metaspace", "BertPreTokenizer"
        ):
            # an ABSENT pre_tokenizer without the sentencepiece-shape
            # normalizer is not "default to whitespace": silently
            # whitespace-splitting would produce wrong counts, the
            # exact failure these guards exist to make loud
            raise NotImplementedError(
                f"pre_tokenizer {pre.get('type')!r} "
                "(must be Whitespace, ByteLevel, Metaspace, or "
                "BertPreTokenizer — or absent with a "
                "Prepend/Replace(' '→▁) normalizer, the "
                "sentencepiece whole-text shape)"
            )
        else:
            self.pre_type = pre.get("type")
        self.byte_level = self.pre_type == "ByteLevel"
        self.add_prefix_space = bool(pre.get("add_prefix_space"))
        # use_regex=False is whole-text byte encoding (no word split)
        self.use_regex = pre.get("use_regex", True)
        if self.pre_type == "Metaspace":
            self.ms_replacement = pre.get("replacement", "▁")
            scheme = pre.get("prepend_scheme")
            if scheme is None:
                # legacy serialization: add_prefix_space bool
                # (defaults True, like the Rust struct)
                self.ms_prepend = bool(pre.get("add_prefix_space", True))
            elif scheme in ("always", "first"):
                # identical on a single-segment encode (this
                # interpreter never splits on added special tokens,
                # the only case where they diverge)
                self.ms_prepend = True
            elif scheme == "never":
                self.ms_prepend = False
            else:
                raise NotImplementedError(
                    f"Metaspace prepend_scheme {scheme!r}"
                )
            self.ms_split = bool(pre.get("split", True))
        model = spec["model"]
        self.model_type = model["type"]
        if self.model_type not in (
            "WordLevel", "BPE", "Unigram", "WordPiece"
        ):
            raise NotImplementedError(f"model {self.model_type!r}")
        if self.byte_level and self.model_type != "BPE":
            raise NotImplementedError(
                "ByteLevel pre_tokenizer with a non-BPE model"
            )
        if self.pre_type == "Metaspace" and self.model_type != "Unigram":
            # a real public combo (sentencepiece-BPE), just not one
            # this interpreter implements through METASPACE — the
            # Llama-2 serialization of that family (null
            # pre_tokenizer + Prepend/Replace normalizer, whole-text
            # BPE) IS supported; refuse rather than feed metaspace
            # words to a merge loop never tested on them
            raise NotImplementedError(
                "Metaspace pre_tokenizer with a non-Unigram model"
            )
        if self.pre_type is None and self.model_type in (
            "WordLevel", "WordPiece"
        ):
            # whole-text WordLevel/WordPiece would map the entire
            # document to one lookup / one greedy walk over the whole
            # document — certainly a misread spec
            raise NotImplementedError(
                f"absent pre_tokenizer with a {self.model_type} model"
            )
        if self.model_type == "Unigram":
            # Unigram (SentencePiece) — Viterbi segmentation over a
            # vocab of (piece, log-prob).  Same loud-refusal contract
            # as the BPE options below for anything that would change
            # ids relative to the Rust backend.
            entries = model["vocab"]  # [[piece, log_prob], ...]
            self.uni_scores = {p: float(s) for p, s in entries}
            self.uni_ids = {p: i for i, (p, _) in enumerate(entries)}
            self.uni_max_len = max((len(p) for p, _ in entries), default=1)
            self.uni_byte_ids = None
            if model.get("byte_fallback"):
                # the sentencepiece fallback: a character no piece
                # covers encodes as its UTF-8 bytes, one <0xAB> piece
                # each — only sound when ALL 256 byte pieces exist
                # (coverage is the point), so a partial table refuses
                ids = []
                for b in range(256):
                    p = f"<0x{b:02X}>"
                    if p not in self.uni_ids:
                        raise NotImplementedError(
                            "Unigram byte_fallback with an incomplete "
                            f"byte-piece table (missing {p!r})"
                        )
                    ids.append(self.uni_ids[p])
                self.uni_byte_ids = ids
            if model.get("unk_id") is None and self.uni_byte_ids is None:
                raise NotImplementedError(
                    "Unigram without unk_id or byte_fallback (an "
                    "unknown character would have no fallback — "
                    "refusing rather than dropping it silently)"
                )
            self.uni_unk_id = (
                int(model["unk_id"])
                if model.get("unk_id") is not None
                else None
            )
            # sentencepiece's unknown penalty: 10 below the worst
            # real piece score, so an unknown single char can never
            # beat a real segmentation but still completes the
            # lattice when nothing else covers a position
            self.uni_unk_score = (
                min((float(s) for _, s in entries), default=0.0) - 10.0
            )
            self.vocab = self.uni_ids
            self.unk = None
        else:
            self.vocab: dict[str, int] = model["vocab"]
            self.unk = model.get("unk_token")
        if self.model_type == "WordPiece":
            # the BERT family: greedy longest-match-first with a
            # continuation prefix.  unk_token is REQUIRED (the Rust
            # struct's field — a greedy walk that fails mid-word emits
            # it for the whole word), and must resolve in the vocab.
            if not self.unk or self.unk not in self.vocab:
                raise NotImplementedError(
                    "WordPiece without a vocab-resident unk_token "
                    f"(got {self.unk!r})"
                )
            self.wp_prefix = model.get("continuing_subword_prefix", "##")
            self.wp_max_chars = int(
                model.get("max_input_chars_per_word", 100)
            )
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
            self.bpe_byte_ids = None
            if model.get("byte_fallback"):
                # sentencepiece-BPE fallback (Llama-2 family): a
                # post-merge symbol absent from the vocab encodes as
                # its UTF-8 bytes, one <0xAB> piece each — requires
                # the full byte table, like the Unigram form
                ids = []
                for b in range(256):
                    p = f"<0x{b:02X}>"
                    if p not in self.vocab:
                        raise NotImplementedError(
                            "BPE byte_fallback with an incomplete "
                            f"byte-piece table (missing {p!r})"
                        )
                    ids.append(self.vocab[p])
                self.bpe_byte_ids = ids
            if model.get("fuse_unk") and self.bpe_byte_ids is None:
                # fusing changes ids whenever unk fires; with
                # byte_fallback unk is unreachable, so the flag is
                # then a no-op and tolerated (Llama-2 sets both)
                raise NotImplementedError(
                    "BPE fuse_unk without byte_fallback"
                )
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
            if post.get("type") == "ByteLevel":
                # GPT-2's ByteLevel post-processor only adjusts
                # offsets — it adds no tokens, so for ids/counts it
                # is a no-op
                post = {}
            elif post.get("type") != "TemplateProcessing":
                raise NotImplementedError(
                    f"post_processor {post.get('type')!r}"
                )
        if post:
            specials = post.get("special_tokens", {})
            seen_sequence = False
            for item in post.get("single", []):
                if "Sequence" in item:
                    seen_sequence = True
                elif "SpecialToken" in item:
                    tok = item["SpecialToken"]["id"]
                    sid = specials[tok]["ids"][0]
                    (self.tail_ids if seen_sequence else self.head_ids).append(sid)
        # added tokens (the Rust AddedVocabulary): their literal
        # strings are extracted from the RAW text before
        # normalization/pre-tokenization and emit their pinned ids
        # directly — a packed shard containing "<|endoftext|>" counts
        # it as ONE special id, never as BPE pieces of the literal.
        # Supported shape: the one every mainstream export ships
        # (normalized=false, lstrip/rstrip=false, single_word=false);
        # the whitespace-absorbing / word-boundary / match-after-
        # normalize variants each change ids, so they refuse loudly
        # per the module contract.
        self._added: dict[str, int] = {}
        # normalized=true means "match the token AFTER normalizing the
        # text" — behaviorally inert when the spec has no normalizer
        # (GPT-2's public export ships normalized=true on
        # <|endoftext|> with normalizer: null; ids are identical by
        # construction), so only refuse when a normalizer exists and
        # match-after-normalize could genuinely change ids.
        has_normalizer = bool(spec.get("normalizer"))
        for at in spec.get("added_tokens") or []:
            if (
                (at.get("normalized") and has_normalizer)
                or at.get("lstrip")
                or at.get("rstrip")
                or at.get("single_word")
            ):
                raise NotImplementedError(
                    f"added_token {at.get('content')!r} with "
                    "normalized(+normalizer)/lstrip/rstrip/"
                    "single_word set"
                )
            self._added[at["content"]] = int(at["id"])
        self._added_re = (
            re.compile(
                "|".join(
                    re.escape(t)
                    for t in sorted(self._added, key=len, reverse=True)
                )
            )
            if self._added
            else None
        )

    def _parse_normalizer(self, norm: dict):
        """Supported normalizers → a list of str→str steps, applied in
        order (a Sequence is flattened).  Sets
        ``_sentencepiece_shape`` when a Prepend or Replace(' '→X)
        step is present — the signal that an ABSENT pre_tokenizer
        means sentencepiece whole-text tokenization (the Llama-2
        serialization), not a misread spec.  Anything else
        (Precompiled charsmaps, NFC/NFKC, Regex replaces, Strip...)
        refuses loudly: each would silently change ids."""
        self._sentencepiece_shape = False
        if not norm:
            return []
        items = (
            norm.get("normalizers") or []
            if norm.get("type") == "Sequence"
            else [norm]
        )
        steps = []
        for it in items:
            t = it.get("type")
            if t == "Lowercase":
                steps.append(str.lower)
            elif t == "Prepend":
                p = it["prepend"]
                self._sentencepiece_shape = True
                # HF prepends unconditionally on non-empty input
                # (" x" → "▁ x" → after Replace "▁▁x", the Llama
                # leading-space behavior)
                steps.append(lambda s, _p=p: _p + s if s else s)
            elif t == "Replace":
                pat = it.get("pattern") or {}
                if "String" not in pat:
                    raise NotImplementedError(
                        f"Replace normalizer pattern {pat!r} "
                        "(String patterns only)"
                    )
                frm, to = pat["String"], it.get("content", "")
                if frm == " ":
                    self._sentencepiece_shape = True
                steps.append(lambda s, _f=frm, _t=to: s.replace(_f, _t))
            elif t == "BertNormalizer":
                steps.append(
                    lambda s,
                    _ct=it.get("clean_text", True),
                    _cc=it.get("handle_chinese_chars", True),
                    _sa=it.get("strip_accents"),
                    _lc=it.get("lowercase", True): _bert_normalize(
                        s, _ct, _cc, _sa, _lc
                    )
                )
            else:
                raise NotImplementedError(f"normalizer {t!r}")
        return steps

    @classmethod
    def from_file(cls, path: str) -> "PurePythonTokenizer":
        with open(path) as fh:
            return cls(json.load(fh))

    def _bpe_word(self, word: str) -> list[str]:
        symbols = list(word)
        while len(symbols) > 1:
            pairs = [
                (self.ranks[p], i, p)
                for i, p in enumerate(zip(symbols, symbols[1:]))
                if p in self.ranks
            ]
            if not pairs:
                break
            # the winning pair rides the min directly (the index is
            # unique, so the tuple compare never reaches it) — no
            # rescan of the merge table per iteration
            rank, _, best = min(pairs)
            # merge every (left-to-right, non-overlapping) occurrence
            # of the best-ranked pair — the HF merge step
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

    def _bpe_text(self, text: str) -> list[str]:
        """Heap-based form of the merge loop for the sentencepiece
        WHOLE-TEXT path, where the "word" is the entire document —
        ``_bpe_word``'s per-iteration rescan is O(n²) there.  Lazy
        heap of (rank, position) over a doubly-linked symbol list;
        stale entries are validated against the live symbols before
        merging.  Identical output to ``_bpe_word`` under the
        training-order invariant every real merge list satisfies (a
        pair's rank exceeds the ranks of the merges that built its
        two symbols) — parity is fuzz-tested against the scan form."""
        import heapq

        sym = list(text)
        n = len(sym)
        if n < 2:
            return sym
        nxt = list(range(1, n + 1))
        prv = list(range(-1, n - 1))
        alive = [True] * n
        heap: list[tuple[int, int, str, str]] = []

        def push(i: int) -> None:
            j = nxt[i]
            if j < n:
                r = self.ranks.get((sym[i], sym[j]))
                if r is not None:
                    heapq.heappush(heap, (r, i, sym[i], sym[j]))

        for i in range(n - 1):
            push(i)
        while heap:
            _r, i, a, b = heapq.heappop(heap)
            if not alive[i] or sym[i] != a:
                continue
            j = nxt[i]
            if j >= n or not alive[j] or sym[j] != b:
                continue
            sym[i] = a + b
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[j] < n:
                prv[nxt[j]] = i
            if prv[i] >= 0:
                push(prv[i])
            push(i)
        return [sym[i] for i in range(n) if alive[i]]

    def _metaspace_words(self, text: str) -> list[str]:
        """The Metaspace pre-tokenizer: spaces become the replacement
        codepoint (▁), one is optionally prepended, and the text
        splits so each replacement stays attached to what follows it
        ("hello  world" → ["▁hello", "▁", "▁world"] — a lone ▁ word
        per extra space, matching the merged-with-next split)."""
        rep = self.ms_replacement
        t = text.replace(" ", rep)
        if self.ms_prepend and t and not t.startswith(rep):
            t = rep + t
        if not self.ms_split:
            return [t] if t else []
        parts = t.split(rep)
        words = [parts[0]] if parts[0] else []
        words.extend(rep + p for p in parts[1:])
        return words

    def _unigram_word_ids(self, word: str) -> list[int]:
        """Viterbi over the piece lattice — the public SentencePiece
        algorithm (Kudo 2018): best[e] is the max total log-prob of
        any segmentation of word[:e]; every vocab piece ending at e
        competes, plus a single-char unknown at uni_unk_score, so the
        lattice always completes.  On a score tie the longest piece
        wins (strict improvement keeps the first candidate; starts
        scan longest-first).

        The unknown competitor is ALWAYS the unk penalty (min real
        score − 10), byte_fallback or not — the Rust backend and
        sentencepiece run the lattice that way and expand unknowns to
        <0xAB> byte pieces only AFTER Viterbi, so a byte-piece score
        must never compete with (and beat) a real covering piece
        in-lattice.  Post-Viterbi, consecutive unknown chars FUSE
        (sentencepiece fuse_unk, the conversion default) and each
        fused run then either expands to its UTF-8 bytes' <0xAB>
        pieces (``byte_fallback`` — byte-complete by the load-time
        check, and bytes-of-concatenation == concatenation-of-bytes,
        so fusing cannot change the expansion) or emits one unk_id."""
        n = len(word)
        neg = float("-inf")
        best = [0.0] + [neg] * n
        # back[e]: (start, token-id) for a piece, (start, None) for an
        # unknown char (fused / byte-expanded after the walk)
        back: list[tuple[int, int | None]] = [(0, None)] * (n + 1)
        for e in range(1, n + 1):
            for s in range(max(0, e - self.uni_max_len), e):
                sc = self.uni_scores.get(word[s:e])
                if sc is not None and best[s] + sc > best[e]:
                    best[e] = best[s] + sc
                    back[e] = (s, self.uni_ids[word[s:e]])
            if best[e - 1] + self.uni_unk_score > best[e]:
                best[e] = best[e - 1] + self.uni_unk_score
                back[e] = (e - 1, None)
        rev: list[tuple[int, int | None]] = []
        e = n
        while e > 0:
            s, tid = back[e]
            rev.append((s, tid))
            e = s
        out: list[int] = []
        unk_run: list[str] = []

        def flush_unk() -> None:
            if not unk_run:
                return
            if self.uni_byte_ids is not None:
                out.extend(
                    self.uni_byte_ids[b]
                    for b in "".join(unk_run).encode("utf-8")
                )
            else:
                out.append(self.uni_unk_id)
            unk_run.clear()

        for s, tid in reversed(rev):
            if tid is None:
                unk_run.append(word[s])
            else:
                flush_unk()
                out.append(tid)
        flush_unk()
        return out

    def _wordpiece_word_ids(self, word: str) -> list[int]:
        """The public WordPiece algorithm (google-research/bert
        tokenization.py, as implemented by HF's WordPiece model):
        greedy LONGEST-match-first — repeatedly take the longest vocab
        piece prefixing the remainder (pieces after the first looked
        up with the continuation prefix); a word over
        ``max_input_chars_per_word``, or any position with no matching
        piece, maps the WHOLE word to one unk token (is_bad — never a
        partial emission)."""
        if len(word) > self.wp_max_chars:
            return [self.vocab[self.unk]]
        ids: list[int] = []
        start, n = 0, len(word)
        while start < n:
            end = n
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = self.wp_prefix + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.vocab[self.unk]]
            ids.append(self.vocab[cur])
            start = end
        return ids

    def _word_ids(self, word: str) -> list[int]:
        if self.model_type == "Unigram":
            return self._unigram_word_ids(word)
        if self.model_type == "WordPiece":
            return self._wordpiece_word_ids(word)
        if self.model_type == "WordLevel":
            pieces = [word]
        elif self.pre_type is None:
            # sentencepiece whole-text: the "word" is the document —
            # use the heap merge (the scan form is O(n²) there)
            pieces = self._bpe_text(word)
        else:
            if self.byte_level:
                # GPT-2 byte-level alphabet: utf-8 bytes, each mapped
                # through the public byte→unicode table, so merges and
                # vocab lookups are over printable symbols
                word = "".join(
                    _BYTE_UNICODE[b] for b in word.encode("utf-8")
                )
            pieces = self._bpe_word(word)
        ids = []
        for p in pieces:
            if p in self.vocab:
                ids.append(self.vocab[p])
            elif self.model_type == "BPE" and self.bpe_byte_ids is not None:
                # sentencepiece-BPE byte_fallback: the unmerged symbol
                # encodes as its UTF-8 bytes, one <0xAB> piece each
                ids.extend(
                    self.bpe_byte_ids[b] for b in p.encode("utf-8")
                )
            elif self.unk is not None:
                ids.append(self.vocab[self.unk])
        return ids

    def encode(self, text: str) -> _Encoding:
        if self._added_re is not None:
            # extract added tokens first (longest alternative wins —
            # the pattern is sorted longest-first, matching the Rust
            # trie's leftmost-longest), then run the full pipeline on
            # each intervening segment independently, exactly the
            # AddedVocabulary split semantics (each segment is
            # normalized on its own)
            ids: list[int] = []
            pos = 0
            for m in self._added_re.finditer(text):
                ids.extend(self._segment_ids(text[pos : m.start()]))
                ids.append(self._added[m.group(0)])
                pos = m.end()
            ids.extend(self._segment_ids(text[pos:]))
            return _Encoding(self.head_ids + ids + self.tail_ids)
        return _Encoding(
            self.head_ids + self._segment_ids(text) + self.tail_ids
        )

    def _segment_ids(self, text: str) -> list[int]:
        for step in self._norm_steps:
            text = step(text)
        if self.pre_type is None:
            words = [text] if text else []
        elif self.byte_level:
            if self.add_prefix_space and text and not text.startswith(" "):
                text = " " + text
            words = (
                _gpt2_words(text)
                if self.use_regex
                else ([text] if text else [])
            )
        elif self.pre_type == "Metaspace":
            words = self._metaspace_words(text)
        elif self.pre_type == "BertPreTokenizer":
            words = _bert_words(text)
        else:
            words = _WHITESPACE_PRE.findall(text)
        ids: list[int] = []
        for word in words:
            ids.extend(self._word_ids(word))
        # TemplateProcessing wraps every encoding (the caller adds
        # head/tail ids around the concatenated segments); tokenize.py
        # short-circuits empty text before reaching the tokenizer, so
        # matching HF exactly here (specials added even when empty)
        # keeps the two backends interchangeable
        return ids

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
