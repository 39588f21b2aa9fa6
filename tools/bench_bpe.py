"""Microbench for the batched BPE trainer (VERDICT r4 item #4): wall
clock and round count for >= 1k merges at batch_k=16, plus a classic
vs batched head-to-head at a smaller merge count for the per-merge
ratio. Corpus: deterministic Zipf-ish synthetic vocabulary deep enough
to sustain 1k merges at weight >= 2.

Usage: python tools/bench_bpe.py [n_merges] [batch_k]
Appends one JSON line to BENCH/trials.jsonl with kind=bpe_batched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_corpus(n_words: int = 4000, seed: int = 20260819) -> list[str]:
    """Deterministic vocabulary of 8-14 char words over a 20-letter
    alphabet with Zipf-ish counts (rank r repeated ~n/r times, capped)."""
    import hashlib

    alpha = "abcdefghijklmnopqrst"
    words = []
    for i in range(n_words):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        ln = 8 + h[0] % 7
        w = "".join(alpha[h[1 + j % 14] % 20] for j in range(ln))
        reps = max(2, 64 // (1 + i % 63))
        words.extend([w] * reps)
    return words


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch_k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    head_to_head = 128

    from osm2world_spark.operators.bpe import bpe_train, bpe_train_batched
    from osm2world_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="bench_bpe",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus()
    docs = spark.createDataFrame(
        [(str(i), " ".join(corpus[i::16])) for i in range(16)],
        "doc_id string, text string",
    ).cache()
    docs.count()

    t0 = time.time()
    m_b, _ = bpe_train_batched(docs, n_merges, batch_k=batch_k)
    t_batched = time.time() - t0

    t0 = time.time()
    m_c, _ = bpe_train(docs, head_to_head)
    t_classic_small = time.time() - t0

    t0 = time.time()
    m_b_small, _ = bpe_train_batched(docs, head_to_head, batch_k=batch_k)
    t_batched_small = time.time() - t0

    rec = {
        "kind": "bpe_batched",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_merges": len(m_b),
        "batch_k": batch_k,
        "batched_sec": round(t_batched, 3),
        "merges_per_sec_batched": round(len(m_b) / t_batched, 2),
        "head_to_head_merges": head_to_head,
        "classic_sec_at_h2h": round(t_classic_small, 3),
        "batched_sec_at_h2h": round(t_batched_small, 3),
        "speedup_at_h2h": round(t_classic_small / t_batched_small, 2),
        "schedule_overlap_at_h2h": len(
            set(m_c) & set(m_b_small)
        ) / max(len(m_c), 1),
    }
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "trials.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
