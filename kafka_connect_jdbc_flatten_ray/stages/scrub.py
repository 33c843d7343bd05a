"""Corpus hygiene operators: PII-style scrubbing, deterministic sampling,
document chunking, benchmark-contamination checks.

All vectorized (pyarrow regex kernels / numpy over flattened token arrays);
scrub/sample/chunk have exact DuckDB oracles, contamination uses a
broadcast n-gram hash set (tested with planted contamination).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9]{6,}"


class ScrubText:
    """Replace email addresses and long digit runs with placeholder tokens
    (regexes compiled once per worker; pc.replace_substring_regex kernels)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        out = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
        out = pc.replace_substring_regex(out, LONG_NUM_RE, "<NUM>")
        return pa.table({"doc_id": batch.column("doc_id"), "text": out})


def deterministic_sample(
    docs: ray.data.Dataset, percent: int, salt: int = 2654435761
) -> ray.data.Dataset:
    """Keep ~percent% of docs by a pure-arithmetic doc_id hash — the
    reproducible (and SQL-checkable) alternative to random_sample for
    train/val splits."""

    def _filter(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids * np.int64(salt)) % np.int64(100) < percent
        return t.filter(pa.array(keep))

    return docs.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


class ChunkDocs:
    """Split documents into overlapping token-window chunks:
    (doc_id, chunk_idx, chunk text, n_chunk_tokens). Stride = size - overlap."""

    def __init__(self, size: int = 32, overlap: int = 8):
        assert 0 <= overlap < size
        self.size = size
        self.stride = size - overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.maximum(1, -(-np.maximum(lens - self.size, 0) // self.stride) + 1)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks_py = toks.to_pylist()
        out_doc, out_idx, out_text, out_n = [], [], [], []
        for i in range(batch.num_rows):
            words = toks_py[i]
            for c in range(int(n_chunks[i])):
                start = c * self.stride
                chunk = words[start:start + self.size]
                out_doc.append(doc_id[i])
                out_idx.append(c)
                out_text.append(" ".join(chunk))
                out_n.append(len(chunk))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "chunk": pa.array(out_text, pa.string()),
                "n_chunk_tokens": pa.array(out_n, pa.int64()),
            }
        )


def _stable_hash(words: list[str]) -> int:
    """Process-independent n-gram hash (python's hash() is seed-randomized
    per process, which would break the cross-worker broadcast set)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(" ".join(words).encode(), digest_size=8).digest(), "little"
    )


def _ngram_hashes_of_texts(texts: list[str], n: int = 8) -> set[int]:
    out: set[int] = set()
    for t in texts:
        words = t.split(" ")
        for i in range(max(0, len(words) - n + 1)):
            out.add(_stable_hash(words[i:i + n]))
    return out


class ContaminationCheck:
    """Flag docs sharing any word n-gram with a benchmark set (broadcast
    once via ray.put; per-batch membership test over rolling n-grams)."""

    def __init__(self, benchmark_ref, n: int = 8):
        self.bench = (
            ray.get(benchmark_ref) if not isinstance(benchmark_ref, set) else benchmark_ref
        )
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hits = np.zeros(batch.num_rows, np.int64)
        for i, t in enumerate(text.to_pylist()):
            words = t.split(" ")
            for j in range(max(0, len(words) - self.n + 1)):
                if _stable_hash(words[j:j + self.n]) in self.bench:
                    hits[i] += 1
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "contaminated": pa.array(hits > 0),
                "ngram_hits": pa.array(hits),
            }
        )


def contamination_check(
    docs: ray.data.Dataset, benchmark_texts: list[str], n: int = 8
) -> ray.data.Dataset:
    ref = ray.put(_ngram_hashes_of_texts(benchmark_texts, n))
    return docs.map_batches(
        ContaminationCheck, fn_constructor_args=(ref, n),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )
