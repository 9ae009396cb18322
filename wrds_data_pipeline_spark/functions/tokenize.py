"""Tokenizer-grade token counting (optional dependency path).

``bpe_ish_token_count`` (functions/text.py) is a GPT-2-style regex
pre-tokenizer APPROXIMATION — fine for filtering heuristics, but
packing and token-budget decisions in a production training pipeline
count with the actual model tokenizer.  This module provides that
path on top of the public HuggingFace ``tokenizers`` library
(import-guarded like the torch sink: the library is optional and the
Spark-side plumbing is testable without it via an injected
tokenizer factory).

Scale design:
- ``mapInPandas`` with ONE tokenizer construction per task, not per
  row — tokenizer init (vocab load) is the expensive part; encoding
  is then Rust-side and batched (``encode_batch`` releases the GIL).
- Arrow-batched transfer, row-local computation, zero shuffle: the
  count column rides along with the input partitioning.
- The output feeds ``operators/packing.pack_sequences(token_col=...)``
  and ``plans/corpus.select_to_token_budget(token_col=...)``
  unchanged — counting strategy and packing are orthogonal.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructType


def hf_tokenizer_factory(tokenizer_json_path: str) -> Callable[[], Any]:
    """Factory building a HuggingFace ``tokenizers.Tokenizer`` from a
    serialized tokenizer.json (the public format every HF tokenizer
    ships).  Returned callable runs ON THE EXECUTOR, once per task.
    Raises ImportError at call time when the optional library is
    absent."""

    def factory() -> Any:
        try:
            from tokenizers import Tokenizer  # public optional dep
        except ImportError as exc:  # pragma: no cover - env without lib
            raise ImportError(
                "tokenizer_token_counts needs the public 'tokenizers' "
                "package (pip install tokenizers) or an injected "
                "tokenizer_factory"
            ) from exc
        return Tokenizer.from_file(tokenizer_json_path)

    return factory


def tokenizer_token_counts(
    docs: DataFrame,
    tokenizer_factory: Callable[[], Any],
    text_col: str = "text",
    out_col: str = "n_tokens",
) -> DataFrame:
    """Input rows + ``out_col`` = exact token count of ``text_col``
    under the tokenizer built by ``tokenizer_factory``.

    The factory contract: returns an object with ``encode_batch(list
    [str]) -> list`` of encodings exposing ``.ids`` (the ``tokenizers``
    API), or ``encode(str)`` as a fallback; a plain list return also
    works (``len`` is taken either way) — which is what lets tests
    inject a deterministic fake where the library is absent.

    Null/empty text counts 0 tokens BY CONSTRUCTION: empty strings
    are short-circuited before the tokenizer, because tokenizers with
    special-token post-processors (BERT-style [CLS]/[SEP]) return >0
    ids even for "" — and a packing/budget pipeline must treat an
    empty document as 0 tokens, not as the post-processor overhead.
    (Mirrors the curation pipeline's treatment of null docs as empty,
    not as errors.)
    """
    if out_col in docs.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    # copy the field list: StructType stores the passed list by
    # reference and .add mutates it — without the copy the INPUT
    # DataFrame's schema object would grow the new column too
    schema = StructType(list(docs.schema.fields)).add(out_col, LongType())

    def _mapper(batches: Iterator) -> Iterator:
        tok = tokenizer_factory()  # once per task: init is the cost
        encode_batch = getattr(tok, "encode_batch", None)
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            nonempty = [t for t in texts if t]
            if encode_batch is not None:
                encs = iter(encode_batch(nonempty))
            else:
                encs = iter(tok.encode(t) for t in nonempty)
            pdf[out_col] = [
                len((lambda e: getattr(e, "ids", e))(next(encs))) if t else 0
                for t in texts
            ]
            yield pdf

    return docs.mapInPandas(_mapper, schema=schema)


def tokenizer_corpus_stats(
    docs: DataFrame,
    tokenizer_factory: Callable[[], Any],
    text_col: str = "text",
    unk_id: int | None = None,
) -> DataFrame:
    """One-row corpus evaluation of a tokenizer: (n_docs, n_tokens,
    n_bytes, n_unk, bytes_per_token, unk_rate) — the numbers that
    pick between trained candidates (higher bytes/token = better
    compression on this corpus; unk_rate = coverage).  Same executor
    contract as ``tokenizer_token_counts`` (one tokenizer per task,
    Arrow batches); each batch emits ONE partial row, so the final
    aggregate is over ~task-count rows, not the corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField("n_docs", LongType(), False),
            StructField("n_tokens", LongType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("n_unk", LongType(), False),
        ]
    )

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        tok = tokenizer_factory()
        for pdf in batches:
            texts = [t for t in pdf[text_col] if t is not None]
            if not texts:
                continue
            encs = (
                tok.encode_batch([str(t) for t in texts])
                if hasattr(tok, "encode_batch")
                else [tok.encode(str(t)) for t in texts]
            )
            n_tok = n_unk = 0
            for e in encs:
                ids = getattr(e, "ids", e)
                n_tok += len(ids)
                if unk_id is not None:
                    n_unk += sum(1 for i in ids if i == unk_id)
            yield pd.DataFrame(
                {
                    "n_docs": [len(texts)],
                    "n_tokens": [n_tok],
                    "n_bytes": [
                        sum(len(str(t).encode("utf-8")) for t in texts)
                    ],
                    "n_unk": [n_unk],
                }
            )

    partials = docs.select(text_col).mapInPandas(_mapper, schema=schema)
    return partials.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_bytes").alias("n_bytes"),
        F.sum("n_unk").alias("n_unk"),
    ).select(
        "n_docs",
        "n_tokens",
        "n_bytes",
        "n_unk",
        F.round(F.col("n_bytes") / F.col("n_tokens"), 4).alias(
            "bytes_per_token"
        ),
        F.round(F.col("n_unk") / F.col("n_tokens"), 6).alias("unk_rate"),
    )
