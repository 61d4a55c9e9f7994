"""Synthesize a SAME-PROCESS scale pair for the heavy-family scaling
experiment (SCALING.md): `.tmp/scaleA` and `.tmp/scaleB` with B = 10×A.

Why not just reuse /root/testdata sf0.1 → a hand-rolled sf1: the driver
corpus draws every document from a ~30-word vocabulary, so near-dup
DENSITY is constant in n and the TRUE ANSWER (pairs at J≥0.8) grows
quadratically — 29.5k pairs at 500 docs, 2.91M at 5,000. Extrapolating
that process 10× would measure answer-size blowup (~290M pairs), not
algorithmic scaling. A realistic corpus has bounded duplicate clusters
(each doc has O(1) near-dups), making the answer linear in n; that is
the regime the 100 TB claims are about, so this generator plants it
explicitly:

- documents: 78% unique docs over a 5,000-word vocabulary (random pairs
  essentially never reach J≥0.8), 22% organized into planted clusters
  of 2–4 members — one base doc plus near-copies with ~6% token
  mutations (J ≈ 0.85–0.95) and occasional exact copies.
- embeddings: 64-dim unit vectors; 80% isotropic (cosine collisions at
  0.9 never happen in 64-d), 20% planted near-copies (base + small
  noise, cosine ≈ 0.97–0.995).
- events: user/bucket DENSITY held constant, TIME SPAN scaled 10×
  (30 → 300 days) — "more history", the realistic growth axis for an
  event stream; per-bucket co-location density (what q314's pair count
  depends on) stays flat so its answer also scales ~linearly.

Deterministic (numpy PCG64 seed 7). Writes parquet via pyarrow — no
Spark needed to generate.

Usage: python tools/synth_scale.py [outdir=.tmp] [nA=5000]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_N = 5000
LANGS = ["en", "en", "en", "de", "fr", "zh"]
EVENT_TYPES = ["view", "click", "purchase", "error", "login"]


def _gen_documents(rng: np.random.Generator, n_docs: int) -> pa.Table:
    vocab = np.array([f"w{i}" for i in range(VOCAB_N)])
    texts: list[str] = []
    doc_ids = np.arange(n_docs, dtype=np.int64)
    i = 0
    while len(texts) < n_docs:
        length = int(rng.integers(40, 121))
        base = vocab[rng.integers(0, VOCAB_N, size=length)]
        texts.append(" ".join(base))
        # ~22% of rows belong to planted near-dup clusters: after each
        # base doc, with p=0.18 emit 1-3 mutated/exact copies
        if rng.random() < 0.18 and len(texts) < n_docs:
            for _ in range(int(rng.integers(1, 4))):
                if len(texts) >= n_docs:
                    break
                mut = base.copy()
                if rng.random() < 0.25:
                    texts.append(" ".join(mut))  # exact duplicate
                    continue
                k = max(1, int(len(mut) * rng.uniform(0.02, 0.06)))
                idx = rng.integers(0, len(mut), size=k)
                mut[idx] = vocab[rng.integers(0, VOCAB_N, size=k)]
                texts.append(" ".join(mut))
        i += 1
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n_docs)]
    sources = [f"src{int(x)}" for x in rng.integers(0, 20, size=n_docs)]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": n_chars,
        }
    )


def _gen_embeddings(rng: np.random.Generator, n_vec: int) -> pa.Table:
    d = 64
    vecs = np.empty((n_vec, d), dtype=np.float32)
    i = 0
    while i < n_vec:
        v = rng.standard_normal(d)
        v /= np.linalg.norm(v)
        vecs[i] = v
        i += 1
        if rng.random() < 0.17 and i < n_vec:
            for _ in range(int(rng.integers(1, 3))):
                if i >= n_vec:
                    break
                w = v + rng.standard_normal(d) * rng.uniform(0.05, 0.18)
                w /= np.linalg.norm(w)
                vecs[i] = w.astype(np.float32)
                i += 1
    labels = rng.integers(0, 10, size=n_vec).astype(np.int32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    )


def _gen_events(rng: np.random.Generator, n_events: int, days: int) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = days * 86_400_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, size=n_events)).astype(
        "timedelta64[us]"
    )
    n_users = 1500  # density constant: users per unit time fixed
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_events).astype(np.int64)
            ),
            "event_type": pa.array(
                [EVENT_TYPES[int(x)]
                 for x in rng.integers(0, len(EVENT_TYPES), size=n_events)]
            ),
            "value": pa.array(np.round(rng.uniform(0, 500, size=n_events), 2)),
            "props": pa.array(
                [json.dumps({"k": int(x)})
                 for x in rng.integers(0, 100, size=n_events)]
            ),
        }
    )


def synth(
    out_root: str, n_docs_a: int = 5000, with_c: bool = False
) -> None:
    # scaleA4 (4x) exists for the sub-3s-A-wall protocol: when a probe's
    # scaleA wall sits inside Spark's fixed-overhead floor, the exponent
    # log10(tB/tA) is noise-dominated (round 6 measured q381 flapping
    # 1.11->1.34 on an identical B wall). scale_probe re-bases those
    # probes on A4->B (a 2.5x step whose BOTH walls are above the floor).
    #
    # scaleC (100x, opt-in: --with-c) gives the flagship linear set a
    # SECOND decade: one decade is a single data point on the exponent;
    # A->B->C catches curvature (log-factor creep) a single decade can't.
    tags = [("scaleA", 1), ("scaleA4", 4), ("scaleB", 10)]
    if with_c:
        tags.append(("scaleC", 100))
    for tag, mult in tags:
        d = os.path.join(out_root, tag)
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(7)  # same seed: B extends A's process
        pq.write_table(
            _gen_documents(rng, n_docs_a * mult),
            os.path.join(d, "documents.parquet"),
        )
        pq.write_table(
            _gen_embeddings(rng, (n_docs_a * 2 // 5) * mult),
            os.path.join(d, "embeddings.parquet"),
        )
        pq.write_table(
            _gen_events(rng, 100_000 * mult, days=30 * mult),
            os.path.join(d, "events.parquet"),
        )
        print(f"{tag}: docs={n_docs_a * mult} emb={(n_docs_a * 2 // 5) * mult} "
              f"events={100_000 * mult} -> {d}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--with-c"]
    out = args[0] if args else ".tmp"
    n = int(args[1]) if len(args) > 1 else 5000
    synth(out, n, with_c="--with-c" in sys.argv[1:])
