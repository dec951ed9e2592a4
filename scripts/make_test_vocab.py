#!/usr/bin/env python
"""Generate the tiny tiktoken-format test vocab (tests/golden/tiny_bpe.tiktoken).

From-scratch BPE TRAINER (the standard algorithm: Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): start
from the 256 single-byte tokens, repeatedly merge the most frequent
adjacent pair within pre-tokenized pieces, emitting one new token per
merge. Output format is exactly tiktoken's rank-file format
(base64(token_bytes)<space>rank per line), so `BPETokenizer.from_file`
exercises the same loader a user pointing $SIFT_SPARK_CL100K_PATH at the
real cl100k_base asset would hit -- the swap-in is a one-step env change.

Deterministic: fixed sample text, ties broken by byte order.
"""

from __future__ import annotations

import base64
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sift_spark.core.counters import _PRETOKEN_RE  # noqa: E402

N_MERGES = 100

SAMPLE = (
    "The extraction pipeline reads each page and sifts the main content "
    "from the boilerplate. The tokenizer counts the tokens in the text, "
    "and the selection stage keeps the chunks that fit the budget. "
    "the the the and and and content content tokens tokens text text "
    "pipeline pipeline extraction extraction selection selection chunk "
    "chunks counting counted counter the quick brown fox jumps over the "
    "lazy dog while the sifted flour settles in the pan. "
    "Spark reads parquet tables and writes parquet tables; partitions "
    "shuffle when queries join, and brokers broadcast the small side. "
    "documents document documented documenting readers reading reader "
    "writer writers writing written searches searching searched search "
    "ranked ranking ranks scores scoring scored budget budgets budgeted "
    "window windows windowed markdown markup marker marked streaming "
    "streams streamed batch batches batched shuffle shuffles shuffled "
    "2024 2025 100 1000 , . ! ? ; : it's we've they're can't won't "
) * 2


def train(sample, n_merges):
    pieces = [
        [bytes([b]) for b in m.group().encode("utf-8")]
        for m in _PRETOKEN_RE.finditer(sample)
    ]
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for parts in pieces:
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        # max by (count, REVERSED merged bytes, REVERSED left bytes):
        # a TOTAL order -- two splits of the same merged bytes (e.g.
        # a+bc vs ab+c) would otherwise tie and fall to dict order
        (left, right), freq = max(
            counts.items(),
            key=lambda kv: (
                kv[1],
                [-x for x in kv[0][0] + kv[0][1]],
                [-x for x in kv[0][0]],
            ),
        )
        if freq < 2:
            break
        merged = left + right
        merges.append(merged)
        for parts in pieces:
            i = 0
            while i < len(parts) - 1:
                if parts[i] == left and parts[i + 1] == right:
                    parts[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def main(out_path):
    merges = train(SAMPLE, N_MERGES)
    with open(out_path, "wb") as fh:
        for rank in range(256):
            fh.write(base64.b64encode(bytes([rank])) + b" %d\n" % rank)
        for i, token in enumerate(merges):
            fh.write(base64.b64encode(token) + b" %d\n" % (256 + i))
    print(f"wrote {out_path}: 256 byte tokens + {len(merges)} merges")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "tiny_bpe.tiktoken"))
